"""Recognition task: TrOCR training + CER validation + prediction.

Parity with the reference's ``scripts/train_trocr.py`` /
``train_oneline_ocr.py`` paths: teacher-forced CE with pad masking
(``src/models/trocr_model.py:258-292``), greedy/beam generation for val
(``:303-316``), corpus CER fitness (``:400``), EMA weights for eval,
bf16 compute.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kuzu.api.model import register_task
from kuzu.core.callbacks import LOGGER
from kuzu.core.mesh import shard_batch
from kuzu.data.loader import DataLoader
from kuzu.data.ocr_datasets import (
    ColumnInfoDataset,
    OneLineDataset,
    build_tokenizer_from_datasets,
)
from kuzu.data.tokenizer import CharTokenizer
from kuzu.models.trocr import TrOCR, generate
from kuzu.tasks.base import BaseTrainer


def _image_size(cfg) -> tuple[int, int]:
    v = cfg.get("imgsz", [1024, 64])
    if isinstance(v, int):
        return (v, v)
    return (int(v[0]), int(v[1]))


class RecognizeTrainer(BaseTrainer):
    # from-scratch TrOCR under the YOLO SGD auto-rule stalls (production
    # v2/v3 plateaued at val CER ~0.9); the reference fine-tunes with
    # AdamW (lightning default)
    auto_optimizer = "adamw"

    def build_datasets(self):
        cfg = self.cfg
        data = str(cfg.data)
        size = _image_size(cfg)
        max_len = int(cfg.get("max_label_length", 128))

        tok_path = cfg.get("tokenizer")
        if not tok_path and cfg.get("pretrained") not in (None, "", True, False):
            # fine-tuning (full or LoRA) from a previous recognize run: the
            # token ids must line up with the restored embedding/lm_head
            pre_tok = Path(str(cfg.pretrained)) / "tokenizer.json"
            if pre_tok.exists():
                tok_path = pre_tok
        if not tok_path and cfg.get("decoder_init"):
            # decoder initialization from a pretrained char-LM run implies
            # that run's tokenizer (token ids must line up with the grafted
            # embedding — the reference's decoder_path brings its tokenizer,
            # ``src/models/trocr_model.py:225``)
            lm_tok = Path(str(cfg.decoder_init)) / "tokenizer.json"
            if lm_tok.exists():
                tok_path = lm_tok
        tokenizer = CharTokenizer.load(tok_path) if tok_path else None

        aug = bool(cfg.get("augment", True))
        if data.endswith(".csv"):
            make = lambda split, tok: ColumnInfoDataset(
                data, tok, split=split, image_size=size, max_length=max_len,
                augment=aug and split == "train",
                seed=int(cfg.get("seed", 0)),
                cache_images=cfg.get("cache_images"),
            )
        else:
            make = lambda split, tok: OneLineDataset(
                data, tok, split=split, image_size=size, max_length=max_len,
                augment=aug and split == "train",
                seed=int(cfg.get("seed", 0)),
            )
        if tokenizer is None:
            probe = make("train", None)
            tokenizer = build_tokenizer_from_datasets(probe)
        self.tokenizer = tokenizer
        tokenizer.save(self.save_dir / "tokenizer.json")
        self.train_ds = make("train", tokenizer)
        self.val_ds = make("val", tokenizer)
        if len(self.val_ds) == 0:
            self.val_ds = self.train_ds
        batch = int(cfg.get("batch", 16))
        return (
            DataLoader(
                self.train_ds,
                batch,
                shuffle=True,
                seed=int(cfg.get("seed", 0)),
                num_workers=int(cfg.get("workers", 4)),
            ),
            DataLoader(
                self.val_ds,
                batch,
                shuffle=False,
                pad_last=True,
                num_workers=int(cfg.get("workers", 4)),
            ),
        )

    def build_model(self) -> Any:
        cfg = self.cfg
        size = _image_size(cfg)
        dtype = jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
        self.model = TrOCR(
            vocab_size=len(self.tokenizer),
            image_size=size,
            patch_size=(int(cfg.get("patch", 16)),) * 2,
            enc_dim=int(cfg.get("enc_dim", 384)),
            enc_depth=int(cfg.get("enc_depth", 6)),
            enc_heads=int(cfg.get("enc_heads", 6)),
            dec_dim=int(cfg.get("dec_dim", 256)),
            dec_depth=int(cfg.get("dec_depth", 4)),
            dec_heads=int(cfg.get("dec_heads", 8)),
            max_len=int(cfg.get("max_label_length", 128)),
            dropout=float(cfg.get("dropout", 0.0)),
            encoder_type=str(cfg.get("encoder", "vit")),
            ctc_head=float(cfg.get("ctc_weight", 0.0)) > 0,
            dtype=dtype,
        )
        images = jnp.zeros((1, *size, 3), jnp.float32)
        tokens = jnp.zeros((1, 8), jnp.int32)
        if self.model.ctc_head:
            # flax materializes params lazily: trace the aux-CTC path too
            def _init(m, images, tokens):
                mem = m.encode(images)
                return m.decode_tokens(tokens, mem, train=False), m.ctc_logits(mem)

            variables = self.model.init(
                jax.random.key(int(cfg.get("seed", 0))), images, tokens,
                method=_init,
            )
        else:
            variables = self.model.init(
                jax.random.key(int(cfg.get("seed", 0))), images, tokens
            )
        params = variables["params"]
        pre = cfg.get("pretrained")
        if pre not in (None, "", True, False):
            # full-weight warm start from a previous recognize run — the
            # base for LoRA fine-tuning (lora_rank=N pretrained=<run>)
            from kuzu.core.checkpoint import CheckpointManager, partial_load
            from kuzu.core.lora import maybe_merge

            from kuzu.core.config import load_config

            pre_dir = Path(str(pre))
            mgr = CheckpointManager(pre_dir / "weights")
            raw = mgr.restore("best" if mgr.exists("best") else "last")
            src = raw.get("ema_params") or raw.get("params")
            pre_args = pre_dir / "args.yaml"
            pre_cfg = load_config(pre_args if pre_args.exists() else None)
            params, n, t = partial_load(params, maybe_merge(src, pre_cfg))
            LOGGER.info(f"pretrained: {n}/{t} tensors from {pre}")
        dec_init = cfg.get("decoder_init")
        if dec_init:
            params = self._graft_decoder(params, Path(str(dec_init)))
        return params

    def _graft_decoder(self, params, lm_run: Path):
        """Load a trained CharMLM run and graft it into the AR decoder
        (reference ``trocr_model.py:225-231`` pretrained-decoder recipe)."""
        from kuzu.core.checkpoint import CheckpointManager
        from kuzu.core.config import load_config
        from kuzu.core.train import build_optimizer, init_state
        from kuzu.models.lm import CharMLM
        from kuzu.models.trocr import graft_lm_decoder

        lm_cfg = load_config(
            lm_run / "args.yaml" if (lm_run / "args.yaml").exists() else None
        )
        lm = CharMLM(
            vocab_size=len(self.tokenizer),
            max_len=int(lm_cfg.get("max_length", 128)),
            dim=int(lm_cfg.get("dim", 256)),
            depth=int(lm_cfg.get("depth", 6)),
            num_heads=int(lm_cfg.get("heads", 8)),
        )
        lm_params = lm.init(
            jax.random.key(0), jnp.zeros((1, lm.max_len), jnp.int32)
        )["params"]
        state = init_state(lm_params, build_optimizer(lm_cfg), use_ema=True)
        mgr = CheckpointManager(lm_run / "weights")
        from kuzu.core.checkpoint import load_inference_params

        lm_params, _ = load_inference_params(mgr, state, train_cfg=lm_cfg)
        lm_emb = np.asarray(lm_params["embed"]["embedding"]).shape
        dec_emb = np.asarray(params["decoder"]["embed"]["embedding"]).shape
        if lm_emb != dec_emb:
            raise ValueError(
                f"decoder_init={lm_run}: LM embedding {lm_emb} does not "
                f"match decoder embedding {dec_emb} — dim or vocab mismatch "
                f"(dec_dim={self.model.dec_dim}); no tensors transferred"
            )
        params, n, total = graft_lm_decoder(params, lm_params)
        LOGGER.info(
            f"decoder_init: grafted {n}/{total} decoder tensors from {lm_run}"
        )
        return params

    def loss_fn(self, params, batch, rng):
        """Teacher-forced CE, optionally hardened against free-running
        decode collapse (the production v4 failure mode: val tf_acc climbs
        while free-running CER stays ~0.9 — the from-scratch decoder leans
        on the text prior instead of the image; the reference never hits
        this because it starts from pretrained TrOCR weights,
        ``src/models/trocr_model.py:205``):

        - ``ctc_weight>0``: joint CTC+attention — an auxiliary CTC loss on
          the encoder memory (blank=0=<pad>, same convention as the CTC
          task) forces monotonic visual alignment in the encoder.
        - ``ss_prob>0``: scheduled sampling — a first no-grad decoder pass
          produces model predictions; each non-BOS input token is replaced
          by the model's own previous-step prediction with prob ss_prob,
          so training matches the free-running input distribution.
        """
        tokens = batch["tokens"]  # (B, L) = <s> text </s> pad...
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]
        images = batch["image"]
        if images.dtype == jnp.uint8 and bool(self.cfg.get("augment", True)):
            # photometric jitter on-device (geometric jitter stays in the
            # dataset); float input passes through TrOCR._norm untouched,
            # so finish the normalization here
            from kuzu.ops.images import from_uint8, photometric_aug

            rng, arng = jax.random.split(rng)
            images = photometric_aug(from_uint8(images), arng)
            images = (images - 0.5) / 0.5  # model sees the final convention
        pad = self.tokenizer.pad_id
        ss_prob = float(self.cfg.get("ss_prob", 0.0))
        ctc_w = float(self.cfg.get("ctc_weight", 0.0))
        rng, drng, srng = jax.random.split(rng, 3)
        memory = self.model.apply(
            {"params": params},
            images,
            method=TrOCR.encode_train,
            rngs={"dropout": drng},
        )
        dec = lambda toks, r: self.model.apply(
            {"params": params},
            toks,
            memory,
            method=TrOCR.decode_tokens,
            rngs={"dropout": r},
        )
        if ss_prob > 0:
            # pass 1 (no grad): the model's own free-running-ish predictions
            rng, r1 = jax.random.split(rng)
            logits0 = jax.lax.stop_gradient(
                dec(inputs, r1)
            )
            preds = logits0.argmax(-1).astype(inputs.dtype)  # pred of targets
            # input position t holds token[t]; the model's candidate for it
            # is its prediction at position t-1
            prev_pred = jnp.concatenate([inputs[:, :1], preds[:, :-1]], axis=1)
            pos = jnp.arange(inputs.shape[1])[None, :]
            replace = (
                (jax.random.uniform(srng, inputs.shape) < ss_prob)
                & (pos > 0)
                & (inputs != pad)
            )
            inputs = jnp.where(replace, prev_pred, inputs)
        logits = dec(inputs, rng)
        mask = (targets != pad).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
        loss = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        acc = (((logits.argmax(-1) == targets) * mask).sum()) / jnp.maximum(
            mask.sum(), 1.0
        )
        metrics = {"token_acc": acc}
        if ctc_w > 0:
            from kuzu.ops.ctc import ctc_loss

            ctc_logits = self.model.apply(
                {"params": params}, memory, method=TrOCR.ctc_logits
            )
            T = ctc_logits.shape[1]
            # CTC labels: text chars only (ids >= 5), left-packed, blank=0
            labels = jnp.where(tokens >= 5, tokens, 0)
            order = jnp.argsort(jnp.where(tokens >= 5, 0, 1), axis=1, stable=True)
            labels = jnp.take_along_axis(labels, order, axis=1)[:, :T]
            label_lens = (tokens >= 5).sum(axis=1)
            logit_lens = jnp.full((ctc_logits.shape[0],), T)
            per = ctc_loss(
                ctc_logits, labels, logit_lens, label_lens, blank=0,
                reduction="none",
            )
            # a label needing more frames than the T encoder rows has no
            # valid alignment (CTC needs len + #adjacent-repeats frames) —
            # its loss is ~1e30 garbage; mask it, and clamp besides (the
            # first CLI drive of this path blew up to 2e27 without this)
            reps = ((labels[:, 1:] == labels[:, :-1]) & (labels[:, 1:] != 0)).sum(1)
            feasible = ((label_lens + reps <= T) & (per < 1e6)).astype(
                jnp.float32
            )
            per = jnp.where(feasible > 0, per, 0.0)
            denom = jnp.clip(label_lens.astype(jnp.float32), 1, None)
            aux = (per / denom).sum() / jnp.maximum(feasible.sum(), 1.0)
            loss = loss + ctc_w * aux
            metrics["ctc_loss"] = aux
        return loss, metrics

    def validate(self, state) -> dict[str, float]:
        params = state.ema_params if state.ema_params is not None else state.params
        tok = self.tokenizer
        max_gen = int(self.cfg.get("max_label_length", 128))
        preds: list[str] = []
        refs: list[str] = []
        from kuzu.tasks.base import resolve_val_batches

        max_batches = resolve_val_batches(self.cfg, self.val_loader, "val_gen_batches")
        if not hasattr(self, "_tf_acc"):
            # teacher-forced val accuracy: separates "can't read the images"
            # (low tf_acc: overfit/underfit) from free-running decode
            # collapse (high tf_acc, high CER: exposure bias)
            pad = self.tokenizer.pad_id

            def _tf(params, images, tokens, smask):
                logits = self.model.apply(
                    {"params": params}, images, tokens[:, :-1], train=False
                )
                targets = tokens[:, 1:]
                m = (targets != pad).astype(jnp.float32) * smask[:, None]
                correct = ((logits.argmax(-1) == targets) * m).sum()
                return correct, m.sum()

            self._tf_acc = jax.jit(_tf)
        n_correct = n_tok = 0.0
        for bi, batch in enumerate(self.val_loader):
            if bi >= max_batches:
                break
            n_real = int(batch.get("sample_mask", np.ones(len(batch["image"]))).sum())
            images = jnp.asarray(batch["image"])
            smask = jnp.asarray(
                batch.get("sample_mask", np.ones(len(batch["image"]))), jnp.float32
            )
            c, t = self._tf_acc(params, images, jnp.asarray(batch["tokens"]), smask)
            n_correct += float(c)
            n_tok += float(t)
            out = generate(
                self.model,
                params,
                images,
                max_len=max_gen,
                bos_id=tok.bos_id,
                eos_id=tok.eos_id,
                decode=str(self.cfg.get("decode", "greedy")),
                num_beams=int(self.cfg.get("num_beams", 4)),
                length_penalty=float(self.cfg.get("length_penalty", 1.0)),
            )
            preds.extend(tok.batch_decode(np.asarray(out)[:n_real]))
            refs.extend(tok.batch_decode(np.asarray(batch["tokens"])[:n_real, 1:]))
        if not refs:
            return {}
        from kuzu.core.metrics import character_error_rate

        cer = character_error_rate(preds, refs)
        if self.cfg.get("verbose", True) and preds:
            LOGGER.info(f"  sample: pred={preds[0]!r} ref={refs[0]!r}")
        return {
            "cer": cer,
            "tf_acc": n_correct / max(n_tok, 1.0),
            "fitness": 1.0 - cer,
        }


class RecognizePredictor:
    """Batched page-column -> text prediction with a restored checkpoint."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ready = False

    def _setup(self):
        from kuzu.core.checkpoint import CheckpointManager
        from kuzu.core.config import load_config

        run_dir = Path(str(self.cfg.get("model")))
        args = run_dir / "args.yaml"
        train_cfg = load_config(args if args.exists() else None)
        self.tokenizer = CharTokenizer.load(run_dir / "tokenizer.json")
        size = _image_size(train_cfg)
        self.image_size = size
        self.model = TrOCR(
            vocab_size=len(self.tokenizer),
            image_size=size,
            patch_size=(int(train_cfg.get("patch", 16)),) * 2,
            enc_dim=int(train_cfg.get("enc_dim", 384)),
            enc_depth=int(train_cfg.get("enc_depth", 6)),
            enc_heads=int(train_cfg.get("enc_heads", 6)),
            dec_dim=int(train_cfg.get("dec_dim", 256)),
            dec_depth=int(train_cfg.get("dec_depth", 4)),
            dec_heads=int(train_cfg.get("dec_heads", 8)),
            max_len=int(train_cfg.get("max_label_length", 128)),
            encoder_type=str(train_cfg.get("encoder", "vit")),
            # checkpoints trained with the joint CTC+attention loss carry a
            # ctc_proj param — the inference tree must match to restore
            ctc_head=float(train_cfg.get("ctc_weight", 0.0)) > 0,
        )
        images = jnp.zeros((1, *size, 3), jnp.float32)
        tokens = jnp.zeros((1, 8), jnp.int32)
        if self.model.ctc_head:
            def _init(m, images, tokens):
                mem = m.encode(images)
                return m.decode_tokens(tokens, mem, train=False), m.ctc_logits(mem)

            params = self.model.init(
                jax.random.key(0), images, tokens, method=_init
            )["params"]
        else:
            params = self.model.init(jax.random.key(0), images, tokens)["params"]
        mgr = CheckpointManager(run_dir / "weights")
        name = "best" if mgr.exists("best") else "last"
        from kuzu.core.checkpoint import load_inference_params
        from kuzu.core.train import build_optimizer, init_state

        state = init_state(params, build_optimizer(train_cfg), use_ema=True)
        self.params, _ = load_inference_params(
            mgr, state, train_cfg=train_cfg, name=name
        )
        from kuzu.core.mesh import setup_inference_dp

        setup_inference_dp(self, self.cfg)
        if self._dp is not None:
            self.params = self._dp.params(self.params)
        self.ready = True

    def __call__(self, source) -> list[str]:
        if not self.ready:
            self._setup()
        from kuzu.data.loader import next_bucket
        from kuzu.data.ocr_datasets import load_letterboxed

        paths = [source] if isinstance(source, (str, Path)) else list(source)
        images = np.stack([load_letterboxed(p, *self.image_size) for p in paths])
        # pad to a static bucket (dp-divisible) so repeat calls with varying
        # counts reuse the compiled program
        n = len(images)
        npad = next_bucket(n, min_bucket=self.min_bucket)
        if npad > n:
            images = np.concatenate([images, np.zeros_like(images[:1]).repeat(npad - n, 0)])
        out = generate(
            self.model,
            self.params,
            self._put(images),
            max_len=self.model.max_len,
            bos_id=self.tokenizer.bos_id,
            eos_id=self.tokenizer.eos_id,
            decode=str(self.cfg.get("decode", "greedy")),
            num_beams=int(self.cfg.get("num_beams", 4)),
            length_penalty=float(self.cfg.get("length_penalty", 1.0)),
        )
        return self.tokenizer.batch_decode(np.asarray(out)[:n])


class RecognizeValidator:
    """Standalone CER evaluation of a trained run on a data split."""

    def __init__(self, cfg):
        self.cfg = cfg

    def run(self) -> dict:
        from kuzu.tools.evaluation import evaluate_recognizer

        return evaluate_recognizer(
            str(self.cfg.get("model")),
            str(self.cfg.get("data")),
            split=str(self.cfg.get("split", "val")),
            max_samples=self.cfg.get("max_samples"),
        )


register_task(
    "recognize",
    trainer=RecognizeTrainer,
    predictor=RecognizePredictor,
    validator=RecognizeValidator,
)
