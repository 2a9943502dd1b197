"""Glyph classification task (SimpleViT) — the minimum end-to-end slice.

Trainer/validator parity with the reference's single-glyph classifier
experiments (``scripts/train_simplevit_char.py``): image-folder-per-unicode
dataset, CE loss, top-1 accuracy fitness, EMA weights for eval.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kuzu.api.model import register_task
from kuzu.core.mesh import shard_batch
from kuzu.core.train import make_eval_step
from kuzu.data.folder_dataset import GlyphFolderDataset
from kuzu.data.loader import DataLoader
from kuzu.models.simple_vit import SimpleViT
from kuzu.tasks.base import BaseTrainer


class ClassifyTrainer(BaseTrainer):
    def build_datasets(self):
        cfg = self.cfg
        root = Path(cfg.data)
        imgsz = int(cfg.get("imgsz", 128))
        # YOLO-cls backbones are RGB; SimpleViT glyphs default to grayscale
        channels = (
            3 if self._is_yolo(cfg.get("model"))
            else int(cfg.get("channels", 1))
        )
        train_root = root / "train" if (root / "train").exists() else root
        val_root = root / "val" if (root / "val").exists() else train_root
        self.train_ds = GlyphFolderDataset(train_root, imgsz, channels)
        self.val_ds = GlyphFolderDataset(
            val_root, imgsz, channels, class_map=self.train_ds.class_map
        )
        self.train_ds.save_class_map(self.save_dir / "class_map.json")
        batch = int(cfg.get("batch", 16))
        loader = DataLoader(
            self.train_ds,
            batch,
            shuffle=True,
            seed=int(cfg.get("seed", 0)),
            num_workers=int(cfg.get("workers", 4)),
        )
        val_loader = DataLoader(
            self.val_ds,
            batch,
            shuffle=False,
            pad_last=True,
            num_workers=int(cfg.get("workers", 4)),
        )
        return loader, val_loader

    @staticmethod
    def _is_yolo(name: str | None) -> bool:
        return bool(name) and ("-cls" in str(name))

    def build_model(self) -> Any:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
        self._model_state = None
        if self._is_yolo(cfg.get("model")):
            # YOLO-backbone classifier (reference ClassificationModel,
            # nn/tasks.py + Classify head) — BatchNorm stats ride in
            # model_state like the detect tasks
            from kuzu.models.yolo.graph import (
                YoloGraph, parse_model_yaml, resolve_model_spec,
            )

            path, scale = resolve_model_spec(str(cfg.get("model")))
            spec = parse_model_yaml(
                path, scale=scale, nc=self.train_ds.num_classes
            )
            self.model = YoloGraph(spec, dtype=dtype)
            imgsz = int(cfg.get("imgsz", 128))
            sample = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
            variables = jax.jit(
                lambda r: self.model.init(r, sample, train=False)
            )(jax.random.key(int(cfg.get("seed", 0))))
            self._model_state = {
                k: v for k, v in variables.items() if k != "params"
            }
            return variables["params"]
        self.model = SimpleViT(
            num_classes=self.train_ds.num_classes,
            image_size=(int(cfg.get("imgsz", 128)),) * 2,
            patch_size=(int(cfg.get("patch", 16)),) * 2,
            dim=int(cfg.get("dim", 256)),
            depth=int(cfg.get("depth", 6)),
            num_heads=int(cfg.get("heads", 8)),
            dropout=float(cfg.get("dropout", 0.0)),
            dtype=dtype,
        )
        sample = jnp.zeros(
            (1, *self.model.image_size, int(cfg.get("channels", 1))), jnp.float32
        )
        variables = self.model.init(jax.random.key(int(cfg.get("seed", 0))), sample)
        return variables["params"]

    def _init_model_state(self):
        return self._model_state

    def _ce(self, logits, batch):
        labels = batch["label"]
        ls = float(self.cfg.get("label_smoothing", 0.0))
        one_hot = optax.smooth_labels(
            jax.nn.one_hot(labels, logits.shape[-1]), ls
        )
        loss = optax.softmax_cross_entropy(logits, one_hot).mean()
        acc = (logits.argmax(-1) == labels).mean()
        return loss, acc

    def loss_fn(self, params, *args):
        if self._model_state is not None:  # YOLO-cls (BatchNorm stats)
            model_state, batch, rng = args
            logits, mutated = self.model.apply(
                {"params": params, **model_state}, batch["image"], train=True,
                mutable=["batch_stats"],
            )
            loss, acc = self._ce(logits, batch)
            return loss, ({"acc": acc}, dict(mutated))
        batch, rng = args
        logits = self.model.apply(
            {"params": params}, batch["image"], train=True, rngs={"dropout": rng}
        )
        loss, acc = self._ce(logits, batch)
        return loss, {"acc": acc}

    def validate(self, state) -> dict[str, float]:
        params = state.ema_params if state.ema_params is not None else state.params
        extra = state.model_state or {}

        def eval_fn(p, batch):
            logits = self.model.apply(
                {"params": p, **extra}, batch["image"], train=False
            )
            return {
                "correct": (logits.argmax(-1) == batch["label"]).astype(jnp.float32),
                "loss": optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch["label"]
                ),
            }

        step = getattr(self, "_eval_step", None)
        if step is None:
            step = self._eval_step = make_eval_step(
                lambda p, b: eval_fn(p, b), mesh=self.mesh
            )
        total, correct, loss_sum = 0.0, 0.0, 0.0
        for batch in self.val_loader:
            mask = batch.pop("sample_mask", np.ones(len(batch["label"]), np.float32))
            batch = shard_batch(batch, self.mesh)
            out = step(params, batch)
            correct += float((np.asarray(out["correct"]) * mask).sum())
            loss_sum += float((np.asarray(out["loss"]) * mask).sum())
            total += float(mask.sum())
        if total == 0:
            return {}
        acc = correct / total
        return {"acc": acc, "loss": loss_sum / total, "fitness": acc}


class ClassifyValidator:
    """Standalone val entry: restore best/last ckpt and evaluate."""

    def __init__(self, cfg):
        self.cfg = cfg

    def run(self) -> dict:
        cfg = self.cfg
        ckpt = cfg.get("model")
        wdir = None
        if ckpt and Path(str(ckpt)).exists():
            # accept the run dir or its weights/ dir; adopt the run's
            # args.yaml (arch, imgsz, lora_rank...) so the rebuilt model
            # matches the checkpoint
            run_dir = Path(str(ckpt))
            if (run_dir / "weights").exists():
                wdir = run_dir / "weights"
            else:
                wdir, run_dir = run_dir, run_dir.parent
            from kuzu.core.config import rebase_on_run_config

            cfg = rebase_on_run_config(cfg, run_dir)
        trainer = ClassifyTrainer(cfg)
        trainer.train_loader, trainer.val_loader = trainer.build_datasets()
        params = trainer.build_model()
        from kuzu.core.train import build_optimizer, init_state

        state = init_state(
            params, build_optimizer(cfg), use_ema=True,
            model_state=trainer._model_state,
        )
        if wdir is not None:
            from kuzu.core.checkpoint import (
                CheckpointManager,
                load_inference_params,
            )

            mgr = CheckpointManager(wdir)
            p, ms = load_inference_params(mgr, state, train_cfg=cfg)
            state = state.replace(
                params=p,
                ema_params=None,
                model_state=ms if ms is not None else state.model_state,
            )
        return trainer.validate(state)


class ClassifyPredictor:
    """Restore a trained run; predict class names for glyph images."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ready = False

    def _setup(self):
        import json

        from kuzu.core.checkpoint import CheckpointManager
        from kuzu.core.config import load_config
        from kuzu.core.train import build_optimizer, init_state

        run_dir = Path(str(self.cfg.get("model")))
        train_cfg = load_config(
            run_dir / "args.yaml" if (run_dir / "args.yaml").exists() else None
        )
        class_map = json.loads((run_dir / "class_map.json").read_text())
        self.idx_to_name = {int(v): k for k, v in class_map.items()}
        self.imgsz = int(train_cfg.get("imgsz", 128))
        arch = str(train_cfg.get("model") or "")
        model_state = None
        if ClassifyTrainer._is_yolo(arch):
            from kuzu.models.yolo.graph import (
                YoloGraph, parse_model_yaml, resolve_model_spec,
            )

            self.channels = 3
            path_, scale = resolve_model_spec(arch)
            spec = parse_model_yaml(path_, scale=scale, nc=len(class_map))
            self.model = YoloGraph(spec)
            sample = jnp.zeros((1, self.imgsz, self.imgsz, 3), jnp.float32)
            variables = jax.jit(
                lambda r: self.model.init(r, sample, train=False)
            )(jax.random.key(0))
            params = variables["params"]
            model_state = {k: v for k, v in variables.items() if k != "params"}
        else:
            self.channels = int(train_cfg.get("channels", 1))
            self.model = SimpleViT(
                num_classes=len(class_map),
                image_size=(self.imgsz,) * 2,
                patch_size=(int(train_cfg.get("patch", 16)),) * 2,
                dim=int(train_cfg.get("dim", 256)),
                depth=int(train_cfg.get("depth", 6)),
                num_heads=int(train_cfg.get("heads", 8)),
            )
            sample = jnp.zeros(
                (1, self.imgsz, self.imgsz, self.channels), jnp.float32
            )
            params = self.model.init(jax.random.key(0), sample)["params"]
        state = init_state(
            params, build_optimizer(train_cfg), use_ema=True,
            model_state=model_state,
        )
        mgr = CheckpointManager(run_dir / "weights")
        from kuzu.core.checkpoint import load_inference_params

        params, ms = load_inference_params(mgr, state, train_cfg=train_cfg)
        # weights/stats as jit ARGUMENTS (closures bake into the HLO)
        self.variables = {"params": params, **(ms or {})}
        from kuzu.core.mesh import setup_inference_dp

        setup_inference_dp(self, self.cfg)
        if self._dp is not None:
            self.variables = self._dp.params(self.variables)
        # one set of buffers: self.params aliases the (possibly mesh-placed)
        # tree instead of keeping a second host copy alive
        self.params = self.variables["params"]
        self._fwd = jax.jit(
            lambda v, x: jax.nn.softmax(
                self.model.apply(v, x, train=False), -1
            )
        )
        self.ready = True

    def __call__(self, source) -> list[dict]:
        if not self.ready:
            self._setup()
        from PIL import Image

        paths = [source] if isinstance(source, (str, Path)) else list(source)
        imgs = []
        for p in paths:
            img = Image.open(p).convert("L" if self.channels == 1 else "RGB")
            img = img.resize((self.imgsz, self.imgsz), Image.BILINEAR)
            arr = np.asarray(img, np.uint8)  # models /255 on-device
            if self.channels == 1:
                arr = arr[..., None]
            imgs.append(arr)
        from kuzu.data.loader import next_bucket

        n = len(imgs)
        npad = next_bucket(n, min_bucket=self.min_bucket)
        imgs.extend([np.zeros_like(imgs[0])] * (npad - n))
        probs = np.asarray(
            self._fwd(self.variables, self._put(np.stack(imgs)))
        )[:n]
        out = []
        for p, pr in zip(paths, probs):
            top = int(pr.argmax())
            out.append(
                {
                    "path": str(p),
                    "class": top,
                    "name": self.idx_to_name.get(top, str(top)),
                    "confidence": float(pr[top]),
                }
            )
        return out


register_task(
    "classify",
    trainer=ClassifyTrainer,
    validator=ClassifyValidator,
    predictor=ClassifyPredictor,
)
