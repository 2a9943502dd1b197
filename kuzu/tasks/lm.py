"""Char-LM pretraining task: MLM over one-char tokens.

Parity with the reference ``train_language_model.py`` path: plain-text corpus
(one sample per line) -> one-char tokenizer -> 15% dynamic masking -> MLM CE
on masked positions, masked-token accuracy/precision/recall/F1 metrics
(``compute_metrics :833``), eval-time masked-text restoration previews
(``CustomTrainer.evaluate :286``), early stopping, resume.
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
from kuzu.data.loader import DataLoader
from kuzu.data.tokenizer import CharTokenizer
from kuzu.models.lm import CharMLM, apply_mlm_masking
from kuzu.tasks.base import BaseTrainer


class TextLineDataset:
    """Plain text file(s): one training sample per line, fixed-length ids."""

    def __init__(
        self,
        source: str | Path,
        tokenizer: CharTokenizer,
        max_length: int = 128,
    ):
        p = Path(source)
        files = sorted(p.glob("*.txt")) if p.is_dir() else [p]
        self.lines: list[str] = []
        for f in files:
            self.lines.extend(
                ln.strip() for ln in f.read_text(encoding="utf-8").splitlines() if ln.strip()
            )
        self.tokenizer = tokenizer
        self.max_length = max_length

    def texts(self) -> list[str]:
        return self.lines

    def __len__(self) -> int:
        return len(self.lines)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        tokens = self.tokenizer.encode(self.lines[idx], max_length=self.max_length)
        return {
            "tokens": tokens,
            "attention_mask": (tokens != self.tokenizer.pad_id).astype(np.float32),
        }


class LMTrainer(BaseTrainer):
    auto_optimizer = "adamw"  # transformer LM: Adam, not the YOLO SGD rule

    def build_datasets(self):
        cfg = self.cfg
        max_len = int(cfg.get("max_length", 128))
        tok_path = cfg.get("tokenizer")
        src = Path(str(cfg.data))
        train_src = src / "train.txt" if (src / "train.txt").exists() else src
        val_src = src / "val.txt" if (src / "val.txt").exists() else None

        if tok_path:
            tokenizer = CharTokenizer.load(tok_path)
        else:
            probe = TextLineDataset(train_src, CharTokenizer(), max_len)
            tokenizer = CharTokenizer.train(probe.texts())
        self.tokenizer = tokenizer
        tokenizer.save(self.save_dir / "tokenizer.json")
        self.train_ds = TextLineDataset(train_src, tokenizer, max_len)
        self.val_ds = (
            TextLineDataset(val_src, tokenizer, max_len) if val_src else self.train_ds
        )
        batch = int(cfg.get("batch", 16))
        workers = int(cfg.get("workers", 4))
        return (
            DataLoader(
                self.train_ds, batch, shuffle=True,
                seed=int(cfg.get("seed", 0)), num_workers=workers,
            ),
            DataLoader(
                self.val_ds, batch, shuffle=False, pad_last=True, num_workers=workers
            ),
        )

    def build_model(self) -> Any:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
        self.model = CharMLM(
            vocab_size=len(self.tokenizer),
            max_len=int(cfg.get("max_length", 128)),
            dim=int(cfg.get("dim", 256)),
            depth=int(cfg.get("depth", 6)),
            num_heads=int(cfg.get("heads", 8)),
            dropout=float(cfg.get("dropout", 0.0)),
            dtype=dtype,
        )
        tokens = jnp.zeros((1, int(cfg.get("max_length", 128))), jnp.int32)
        return self.model.init(jax.random.key(int(cfg.get("seed", 0))), tokens)[
            "params"
        ]

    def _mlm(self, tokens, rng):
        return apply_mlm_masking(
            tokens,
            rng,
            mask_id=self.tokenizer.mask_id,
            vocab_size=len(self.tokenizer),
            mlm_prob=float(self.cfg.get("mlm_prob", 0.15)),
            pad_id=self.tokenizer.pad_id,
        )

    def loss_fn(self, params, batch, rng):
        mask_rng, drop_rng = jax.random.split(rng)
        masked, labels = self._mlm(batch["tokens"], mask_rng)
        logits = self.model.apply(
            {"params": params},
            masked,
            batch["attention_mask"],
            train=True,
            rngs={"dropout": drop_rng},
        )
        sel = labels >= 0
        safe_labels = jnp.where(sel, labels, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe_labels)
        denom = jnp.maximum(sel.sum(), 1)
        loss = jnp.where(sel, ce, 0.0).sum() / denom
        acc = (jnp.where(sel, logits.argmax(-1) == safe_labels, False).sum()) / denom
        return loss, {"masked_acc": acc}

    def validate(self, state) -> dict[str, float]:
        params = state.ema_params if state.ema_params is not None else state.params
        rng = jax.random.key(12345)  # fixed eval masking for comparability
        total, correct, loss_sum = 0, 0, 0.0
        shown = 0
        from kuzu.tasks.base import resolve_val_batches

        max_batches = resolve_val_batches(self.cfg, self.val_loader)
        for bi, batch in enumerate(self.val_loader):
            if bi >= max_batches:
                break
            rng, r = jax.random.split(rng)
            masked, labels = self._mlm(jnp.asarray(batch["tokens"]), r)
            logits = self.model.apply(
                {"params": params}, masked, jnp.asarray(batch["attention_mask"])
            )
            sel = np.asarray(labels >= 0)
            pred = np.asarray(logits.argmax(-1))
            lab = np.asarray(labels)
            ce = np.asarray(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.where(labels >= 0, labels, 0)
                )
            )
            mask_rows = np.asarray(batch.get("sample_mask", np.ones(len(lab))))
            for i in range(len(lab)):
                if mask_rows[i] == 0:
                    continue
                s = sel[i]
                total += int(s.sum())
                correct += int((pred[i][s] == lab[i][s]).sum())
                loss_sum += float(ce[i][s].sum())
            # restoration preview (reference restore_masked_text)
            if shown < 2 and self.cfg.get("verbose", True):
                restored = np.asarray(batch["tokens"])[0].copy()
                restored[sel[0]] = pred[0][sel[0]]
                LOGGER.info(
                    "  restore: in=%r out=%r"
                    % (
                        self.tokenizer.decode(np.asarray(masked)[0]),
                        self.tokenizer.decode(restored),
                    )
                )
                shown += 1
        if total == 0:
            return {}
        return {
            "masked_acc": correct / total,
            "loss": loss_sum / total,
            "fitness": correct / total,
        }


class LMPredictor:
    """Masked-text restoration (reference test_trained_model demos)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ready = False

    def _setup(self):
        from kuzu.core.checkpoint import CheckpointManager
        from kuzu.core.config import load_config
        from kuzu.core.train import build_optimizer, init_state

        run_dir = Path(str(self.cfg.get("model")))
        train_cfg = load_config(
            run_dir / "args.yaml" if (run_dir / "args.yaml").exists() else None
        )
        self.tokenizer = CharTokenizer.load(run_dir / "tokenizer.json")
        self.max_len = int(train_cfg.get("max_length", 128))
        self.model = CharMLM(
            vocab_size=len(self.tokenizer),
            max_len=self.max_len,
            dim=int(train_cfg.get("dim", 256)),
            depth=int(train_cfg.get("depth", 6)),
            num_heads=int(train_cfg.get("heads", 8)),
        )
        tokens = jnp.zeros((1, self.max_len), jnp.int32)
        params = self.model.init(jax.random.key(0), tokens)["params"]
        state = init_state(params, build_optimizer(train_cfg), use_ema=True)
        mgr = CheckpointManager(run_dir / "weights")
        from kuzu.core.checkpoint import load_inference_params

        self.params, _ = load_inference_params(mgr, state, train_cfg=train_cfg)
        from kuzu.core.mesh import setup_inference_dp

        setup_inference_dp(self, self.cfg)
        if self._dp is not None:
            self.params = self._dp.params(self.params)
        self.ready = True

    def __call__(self, source) -> list[str]:
        """source: text(s) containing the mask char '〓' -> restored text."""
        if not self.ready:
            self._setup()
        texts = [source] if isinstance(source, str) else list(source)
        tok = self.tokenizer
        out = []
        for t in texts:
            ids = tok.encode(t.replace("〓", "\x00"), max_length=self.max_len)
            # encode mask placeholder: \x00 became <unk>; replace with mask_id
            orig = tok.encode(t, max_length=self.max_len)
            mask_pos = np.array([c == "〓" for c in tok.normalize(t)])
            ids = orig.copy()
            char_positions = np.arange(1, 1 + len(mask_pos))  # after BOS
            for p, is_mask in zip(char_positions, mask_pos):
                if is_mask and p < self.max_len:
                    ids[p] = tok.mask_id
            logits = self.model.apply(
                {"params": self.params},
                jnp.asarray(ids[None]),
                jnp.asarray((ids != tok.pad_id)[None].astype(np.float32)),
            )
            pred = np.asarray(logits.argmax(-1))[0]
            restored = ids.copy()
            restored[ids == tok.mask_id] = pred[ids == tok.mask_id]
            out.append(tok.decode(restored))
        return out


register_task("lm", trainer=LMTrainer, predictor=LMPredictor)
