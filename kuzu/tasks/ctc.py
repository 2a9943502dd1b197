"""CTC recognition task: CRNN training with CTC loss + bbox head.

Parity with the reference's ``train.py``/``OCRModel`` path
(``scripts/ocr_model.py:108`` _common_step: CTC + SmoothL1 bbox loss,
greedy decode, CER ``:236``, mean-IoU ``:247``) and the ``ocr_lightning``
mini-project. Uses the column dataset layout
(``{split}/{images,labels,bounding_boxes}/{book}``) with a vocab built from
label files (<pad>=0 doubles as the CTC blank, <unk>=1 — reference
``build_char_to_int_map`` ``scripts/data_loader.py:173``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kuzu.api.model import register_task
from kuzu.core.mesh import shard_batch
from kuzu.data.loader import DataLoader
from kuzu.data.ocr_datasets import OneLineDataset, build_tokenizer_from_datasets
from kuzu.data.tokenizer import CharTokenizer
from kuzu.models.crnn import CRNN
from kuzu.ops.ctc import ctc_greedy_decode, ctc_loss
from kuzu.tasks.base import BaseTrainer


def _image_size(cfg) -> tuple[int, int]:
    v = cfg.get("imgsz", [512, 64])
    if isinstance(v, int):
        return (v, v)
    return (int(v[0]), int(v[1]))


class CTCTrainer(BaseTrainer):
    auto_optimizer = "adamw"  # reference ocr_lightning trains with Adam

    def build_datasets(self):
        cfg = self.cfg
        size = _image_size(cfg)
        max_len = int(cfg.get("max_label_length", 64))
        with_boxes = int(cfg.get("max_boxes", 0)) > 0
        tok_path = cfg.get("tokenizer")
        tokenizer = CharTokenizer.load(tok_path) if tok_path else None
        data = str(cfg.data)
        if data.endswith(".csv"):
            # column_info.csv (production regime): same data the TrOCR
            # recognizer trains on, so CTC and AR recognizers A/B on equal
            # footing. No bbox head from csv (boxes are page-frame).
            from kuzu.data.ocr_datasets import ColumnInfoDataset

            aug = bool(cfg.get("augment", True))
            make = lambda split, tok: ColumnInfoDataset(
                data, tok, split=split, image_size=size, max_length=max_len,
                augment=aug and split == "train",
                seed=int(cfg.get("seed", 0)),
                cache_images=cfg.get("cache_images"),
            )
        else:
            make = lambda split, tok: OneLineDataset(
                data, tok, split=split, image_size=size,
                max_length=max_len, with_boxes=with_boxes,
                max_boxes=max(int(cfg.get("max_boxes", 0)), 1),
            )
        if tokenizer is None:
            tokenizer = build_tokenizer_from_datasets(make("train", None))
        self.tokenizer = tokenizer
        tokenizer.save(self.save_dir / "tokenizer.json")
        self.train_ds = make("train", tokenizer)
        self.val_ds = make("val", tokenizer)
        if len(self.val_ds) == 0:
            self.val_ds = self.train_ds
        batch = int(cfg.get("batch", 16))
        workers = int(cfg.get("workers", 4))
        return (
            DataLoader(
                self.train_ds, batch, shuffle=True,
                seed=int(cfg.get("seed", 0)), num_workers=workers,
            ),
            DataLoader(
                self.val_ds, batch, shuffle=False, pad_last=True,
                num_workers=workers,
            ),
        )

    def build_model(self) -> Any:
        cfg = self.cfg
        size = _image_size(cfg)
        dtype = jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
        self.model = CRNN(
            num_classes=len(self.tokenizer),
            lstm_hidden=int(cfg.get("lstm_hidden", 256)),
            time_axis=str(cfg.get("time_axis", "height")),
            max_boxes=int(cfg.get("max_boxes", 0)),
            dtype=dtype,
        )
        sample = jnp.zeros((1, *size, 3), jnp.float32)
        variables = jax.jit(
            lambda r: self.model.init(r, sample, train=False)
        )(jax.random.key(int(cfg.get("seed", 0))))
        self._model_state = {k: v for k, v in variables.items() if k != "params"}
        return variables["params"]

    def _init_model_state(self):
        return self._model_state

    def loss_fn(self, params, model_state, batch, rng):
        variables = {"params": params, **model_state}
        images = batch["image"]
        if images.dtype == jnp.uint8 and bool(self.cfg.get("augment", True)):
            # photometric jitter on-device (see recognize.py — geometric
            # jitter stays in the dataset); CRNN normalizes (x-.5)/.5, so
            # finish that here since floats pass through untouched
            from kuzu.ops.images import from_uint8, photometric_aug

            rng, arng = jax.random.split(rng)
            images = (photometric_aug(from_uint8(images), arng) - 0.5) / 0.5
        (logits, boxes), mutated = self.model.apply(
            variables, images, train=True, mutable=["batch_stats"]
        )
        # labels without BOS/EOS: strip specials for CTC (blank=0=<pad>)
        tokens = batch["tokens"]
        labels = jnp.where(tokens >= 5, tokens, 0)  # zero out specials
        # compact: CTC tolerates 0 padding; label_length counts non-specials
        label_lens = (tokens >= 5).sum(axis=1)
        # re-pack labels left-aligned via sort trick (specials -> large key)
        order = jnp.argsort(jnp.where(tokens >= 5, 0, 1), axis=1, stable=True)
        labels = jnp.take_along_axis(labels, order, axis=1)
        T = logits.shape[1]
        logit_lens = jnp.full((logits.shape[0],), T)
        loss = ctc_loss(logits, labels, logit_lens, label_lens, blank=0)
        metrics = {}
        if boxes is not None and "boxes" in batch:
            # normalized GT boxes; SmoothL1 (huber) on valid entries
            size = _image_size(self.cfg)
            norm = jnp.array([size[1], size[0], size[1], size[0]], jnp.float32)
            gt = batch["boxes"] / norm
            nb = batch["num_boxes"][:, None]
            valid = (jnp.arange(gt.shape[1])[None] < nb).astype(jnp.float32)
            hub = optax.huber_loss(boxes, gt).mean(-1)
            box_loss = (hub * valid).sum() / jnp.maximum(valid.sum(), 1.0)
            loss = loss + float(self.cfg.get("box", 1.0)) * box_loss
            metrics["box_loss"] = box_loss
        return loss, (metrics, dict(mutated))

    def validate(self, state) -> dict[str, float]:
        params = state.ema_params if state.ema_params is not None else state.params
        variables = {"params": params, **(state.model_state or {})}
        tok = self.tokenizer

        fwd = getattr(self, "_val_fwd", None)
        if fwd is None:
            def _fwd(variables, images):
                logits, _ = self.model.apply(variables, images, train=False)
                return ctc_greedy_decode(logits, blank=0)
            fwd = self._val_fwd = jax.jit(_fwd)

        from kuzu.tasks.base import resolve_val_batches

        max_batches = resolve_val_batches(self.cfg, self.val_loader)
        preds, refs = [], []
        for bi, batch in enumerate(self.val_loader):
            if bi >= max_batches:
                break
            n_real = int(
                batch.get("sample_mask", np.ones(len(batch["image"]))).sum()
            )
            seqs, lens = fwd(variables, jnp.asarray(batch["image"]))
            seqs, lens = np.asarray(seqs), np.asarray(lens)
            for i in range(n_real):
                preds.append(tok.decode(seqs[i][: lens[i]]))
                refs.append(tok.decode(batch["tokens"][i]))
        if not refs:
            return {}
        from kuzu.core.metrics import character_error_rate

        cer = character_error_rate(preds, refs)
        return {"cer": cer, "fitness": 1.0 - cer}


class CTCPredictor:
    """Restore a trained CRNN run; transcribe column images (greedy CTC)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ready = False

    def _setup(self):
        from kuzu.core.checkpoint import CheckpointManager
        from kuzu.core.config import load_config
        from kuzu.core.train import build_optimizer, init_state

        from pathlib import Path as _P

        run_dir = _P(str(self.cfg.get("model")))
        train_cfg = load_config(
            run_dir / "args.yaml" if (run_dir / "args.yaml").exists() else None
        )
        self.tokenizer = CharTokenizer.load(run_dir / "tokenizer.json")
        self.image_size = _image_size(train_cfg)
        from kuzu.models.crnn import CRNN

        self.model = CRNN(
            num_classes=len(self.tokenizer),
            lstm_hidden=int(train_cfg.get("lstm_hidden", 256)),
            time_axis=str(train_cfg.get("time_axis", "height")),
            max_boxes=int(train_cfg.get("max_boxes", 0)),
        )
        sample = jnp.zeros((1, *self.image_size, 3), jnp.float32)
        variables = jax.jit(lambda r: self.model.init(r, sample, train=False))(
            jax.random.key(0)
        )
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        state = init_state(
            params, build_optimizer(train_cfg), use_ema=True, model_state=model_state
        )
        mgr = CheckpointManager(run_dir / "weights")
        from kuzu.core.checkpoint import load_inference_params

        p, ms = load_inference_params(mgr, state, train_cfg=train_cfg)
        self.variables = {"params": p, **(ms or {})}
        from kuzu.core.mesh import setup_inference_dp

        setup_inference_dp(self, self.cfg)
        if self._dp is not None:
            self.variables = self._dp.params(self.variables)

        def _fwd(variables, images):
            logits, boxes = self.model.apply(variables, images, train=False)
            return ctc_greedy_decode(logits, blank=0), boxes

        self._fwd = jax.jit(_fwd)
        self.ready = True

    def __call__(self, source) -> list[str]:
        if not self.ready:
            self._setup()
        from kuzu.data.ocr_datasets import load_letterboxed
        from pathlib import Path as _P

        paths = [source] if isinstance(source, (str, _P)) else list(source)
        images = np.stack([load_letterboxed(p, *self.image_size) for p in paths])
        from kuzu.data.loader import next_bucket

        n = len(images)
        npad = next_bucket(n, min_bucket=self.min_bucket)
        if npad > n:
            images = np.concatenate(
                [images, np.zeros_like(images[:1]).repeat(npad - n, 0)]
            )
        (seqs, lens), _ = self._fwd(self.variables, self._put(images))
        seqs, lens = np.asarray(seqs)[:n], np.asarray(lens)[:n]
        return [self.tokenizer.decode(s[:m]) for s, m in zip(seqs, lens)]


register_task("ctc", trainer=CTCTrainer, predictor=CTCPredictor)
