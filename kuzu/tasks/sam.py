"""SAM task: promptable-segmentation training, prediction, and AMG.

Parity with the reference SAM family (``yolov12/ultralytics/models/sam/``):
`SAMTrainer` trains the SAM-lite model (``kuzu.models.sam``) on YOLO-seg
polygon data — one sampled instance per image per step, prompted by a
foreground point and (half the time) its box, with the SAM multimask
best-of-K loss (linear focal-BCE + dice on the best mask, MSE on the IoU
head; ``sam/modules/sam.py`` training recipe). `SAMPredictor` segments
from point/box prompts; ``everything()`` is the automatic mask generator
(point grid -> multimask -> quality filter -> mask NMS; ``sam/amg.py``).
The reference ships SA-1B pretrained checkpoints — unavailable under
zero-egress, so kuzu trains from scratch on task data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kuzu.api.model import register_task
from kuzu.data.loader import DataLoader
from kuzu.models.sam import BG, BOX_BR, BOX_TL, FG, PAD, SAM
from kuzu.tasks.base import BaseTrainer

N_PROMPTS = 4  # [fg point, box_tl, box_br, pad] — static prompt width


class SAMPromptDataset:
    """YOLO-seg polygons -> (image, prompt, instance mask) samples."""

    def __init__(self, spec, split: str, imgsz: int, seed: int = 0,
                 augment: bool = False):
        from kuzu.data.yolo_dataset import YoloSegmentDataset

        self.base = YoloSegmentDataset(
            spec, split=split, imgsz=imgsz, max_boxes=64, augment=augment,
            seed=seed,
        )
        self.imgsz = imgsz
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, e: int) -> None:
        self._epoch = e
        if hasattr(self.base, "set_epoch"):
            self.base.set_epoch(e)

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        s = self.base[idx]
        rng = np.random.default_rng(
            (self.seed * 9176 + self._epoch * 7919 + idx) % (2**31)
        )
        overlap = s["masks"]  # (S/r, S/r) int32, pixel i+1 = instance i
        n = int(s["mask_gt"].sum())
        points = np.zeros((N_PROMPTS, 2), np.float32)
        labels = np.full((N_PROMPTS,), PAD, np.int32)
        mh, mw = overlap.shape
        mask = np.zeros((mh, mw), np.float32)
        if n > 0:
            i = int(rng.integers(n))
            mask = (overlap == i + 1).astype(np.float32)
            ys, xs = np.nonzero(mask)
            if len(ys):
                j = int(rng.integers(len(ys)))
                # mask grid -> normalized page coords
                points[0] = ((xs[j] + 0.5) / mw, (ys[j] + 0.5) / mh)
                labels[0] = FG
            if rng.random() < 0.5:
                x1, y1, x2, y2 = s["gt_boxes"][i] / self.imgsz
                points[1] = (x1, y1)
                points[2] = (x2, y2)
                labels[1], labels[2] = BOX_TL, BOX_BR
        return {
            "image": s["image"],
            "points": points,
            "labels": labels,
            "mask": mask,
            "has_instance": np.float32(n > 0),
        }


class SAMTrainer(BaseTrainer):
    auto_optimizer = "adamw"

    def build_datasets(self):
        cfg = self.cfg
        imgsz = int(cfg.get("imgsz", 256))
        from kuzu.data.yolo_dataset import load_dataset_yaml

        spec = load_dataset_yaml(cfg.data)
        self.train_ds = SAMPromptDataset(
            spec, "train", imgsz, seed=int(cfg.get("seed", 0)),
            augment=bool(cfg.get("augment", True)),
        )
        try:
            self.val_ds = SAMPromptDataset(spec, "val", imgsz)
        except FileNotFoundError:
            self.val_ds = SAMPromptDataset(spec, "train", imgsz)
        batch = int(cfg.get("batch", 8))
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
        dtype = jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
        self.model = SAM(
            img_size=int(cfg.get("imgsz", 256)),
            dim=int(cfg.get("dim", 256)),
            enc_depth=int(cfg.get("enc_depth", 6)),
            enc_heads=int(cfg.get("enc_heads", 8)),
            num_masks=int(cfg.get("num_masks", 3)),
            dtype=dtype,
            encoder_kind=str(cfg.get("encoder", "vit")),
        )
        s = self.model.img_size
        variables = jax.jit(
            lambda r: self.model.init(
                r,
                jnp.zeros((1, s, s, 3), jnp.float32),
                jnp.zeros((1, N_PROMPTS, 2), jnp.float32),
                jnp.full((1, N_PROMPTS), PAD, jnp.int32),
            )
        )(jax.random.key(int(cfg.get("seed", 0))))
        return variables["params"]

    @staticmethod
    def _mask_losses(logits, gt):
        """(B, K, h, w) logits vs (B, h, w) gt -> per-mask (B, K) bce/dice
        and actual IoU of the thresholded mask."""
        gt = gt[:, None]
        bce = optax.sigmoid_binary_cross_entropy(logits, gt).mean((-2, -1))
        p = jax.nn.sigmoid(logits)
        inter = (p * gt).sum((-2, -1))
        dice = 1.0 - (2 * inter + 1.0) / (p.sum((-2, -1)) + gt.sum((-2, -1)) + 1.0)
        hard = (logits > 0).astype(jnp.float32)
        hi = (hard * gt).sum((-2, -1))
        iou = hi / jnp.maximum(
            hard.sum((-2, -1)) + gt.sum((-2, -1)) - hi, 1.0
        )
        return bce, dice, iou

    def loss_fn(self, params, batch, rng):
        logits, iou_pred = self.model.apply(
            {"params": params},
            batch["image"],
            batch["points"],
            batch["labels"],
            train=True,
        )
        # decoder masks are at img/4; GT masks arrive at the seg dataset's
        # ratio — resize GT to the decoder grid if they differ
        gt = batch["mask"]
        if gt.shape[-2:] != logits.shape[-2:]:
            gt = jax.image.resize(
                gt, (gt.shape[0], *logits.shape[-2:]), method="nearest"
            )
        bce, dice, iou = self._mask_losses(logits, gt)
        per = bce + dice  # (B, K)
        has = batch["has_instance"]
        best = per.min(axis=1)
        loss_mask = (best * has).sum() / jnp.maximum(has.sum(), 1.0)
        loss_iou = (((iou_pred - iou) ** 2).mean(1) * has).sum() / jnp.maximum(
            has.sum(), 1.0
        )
        loss = loss_mask + loss_iou
        best_iou = (
            jnp.take_along_axis(iou, per.argmin(1)[:, None], 1)[:, 0] * has
        ).sum() / jnp.maximum(has.sum(), 1.0)
        return loss, {"mask_loss": loss_mask, "iou_loss": loss_iou,
                      "best_iou": best_iou}

    def validate(self, state) -> dict[str, float]:
        params = state.ema_params if state.ema_params is not None else state.params
        fwd = getattr(self, "_val_fwd", None)
        if fwd is None:
            def _f(params, batch):
                logits, iou_pred = self.model.apply(
                    {"params": params}, batch["image"], batch["points"],
                    batch["labels"],
                )
                gt = batch["mask"]
                if gt.shape[-2:] != logits.shape[-2:]:
                    gt = jax.image.resize(
                        gt, (gt.shape[0], *logits.shape[-2:]), method="nearest"
                    )
                _, _, iou = self._mask_losses(logits, gt)
                best = jnp.take_along_axis(
                    iou, iou_pred.argmax(1)[:, None], 1
                )[:, 0]
                return (best * batch["has_instance"]).sum(), batch[
                    "has_instance"
                ].sum()

            fwd = self._val_fwd = jax.jit(_f)
        tot = cnt = 0.0
        from kuzu.tasks.base import resolve_val_batches

        max_batches = resolve_val_batches(self.cfg, self.val_loader)
        for bi, batch in enumerate(self.val_loader):
            if bi >= max_batches:
                break
            sm = batch.get("sample_mask")
            b = {k: jnp.asarray(v) for k, v in batch.items() if k != "sample_mask"}
            if sm is not None:
                b["has_instance"] = b["has_instance"] * jnp.asarray(sm, jnp.float32)
            s, c = fwd(params, b)
            tot += float(s)
            cnt += float(c)
        miou = tot / max(cnt, 1.0)
        return {"miou": miou, "fitness": miou}


class SAMPredictor:
    """Prompted segmentation + automatic mask generation from a trained
    SAM run directory."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ready = False

    def _setup(self):
        from kuzu.core.checkpoint import (
            CheckpointManager,
            load_inference_params,
        )
        from kuzu.core.config import load_config
        from kuzu.core.train import build_optimizer, init_state

        run_dir = Path(str(self.cfg.get("model")))
        tc = load_config(
            run_dir / "args.yaml" if (run_dir / "args.yaml").exists() else None
        )
        self.imgsz = int(tc.get("imgsz", 256))
        self.model = SAM(
            img_size=self.imgsz,
            dim=int(tc.get("dim", 256)),
            enc_depth=int(tc.get("enc_depth", 6)),
            enc_heads=int(tc.get("enc_heads", 8)),
            num_masks=int(tc.get("num_masks", 3)),
            encoder_kind=str(tc.get("encoder", "vit")),
        )
        s = self.imgsz
        params = jax.jit(
            lambda r: self.model.init(
                r,
                jnp.zeros((1, s, s, 3), jnp.float32),
                jnp.zeros((1, N_PROMPTS, 2), jnp.float32),
                jnp.full((1, N_PROMPTS), PAD, jnp.int32),
            )
        )(jax.random.key(0))["params"]
        state = init_state(params, build_optimizer(tc), use_ema=True)
        mgr = CheckpointManager(run_dir / "weights")
        self.params, _ = load_inference_params(mgr, state, train_cfg=tc)
        self._encode = jax.jit(
            lambda p, im: self.model.apply({"params": p}, im, method=SAM.encode)
        )
        self._decode = jax.jit(
            lambda p, mem, pts, lbl: self.model.apply(
                {"params": p}, mem, pts, lbl, method=SAM.decode
            )
        )
        self.ready = True

    def _load(self, source) -> tuple[np.ndarray, tuple[int, int]]:
        import cv2

        from kuzu.data.yolo_dataset import letterbox_np

        if isinstance(source, (str, Path)):
            img = cv2.cvtColor(cv2.imread(str(source)), cv2.COLOR_BGR2RGB)
        else:
            img = np.asarray(source)
        hw = img.shape[:2]
        canvas, gain, pad = letterbox_np(img, self.imgsz)
        self._geom = (gain, pad, hw)
        return canvas, hw

    def __call__(self, source, points=None, labels=None, bboxes=None):
        """Segment from prompts. Points/boxes in original-image pixels;
        returns (masks (N, S/4, S/4) bool in the letterboxed frame,
        iou predictions (N,)) — one mask per prompt."""
        if not self.ready:
            self._setup()
        canvas, hw = self._load(source)
        mem = self._encode(self.params, canvas[None])
        gain, (px, py), _ = self._geom
        prompts = []
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.float32))
            lbl = (
                np.ones(len(pts), np.int32)
                if labels is None
                else np.asarray(labels, np.int32)
            )
            for p, l in zip(pts, lbl):
                q = np.zeros((N_PROMPTS, 2), np.float32)
                m = np.full((N_PROMPTS,), PAD, np.int32)
                q[0] = ((p[0] * gain + px) / self.imgsz,
                        (p[1] * gain + py) / self.imgsz)
                m[0] = FG if l else BG
                prompts.append((q, m))
        if bboxes is not None:
            for b in np.atleast_2d(np.asarray(bboxes, np.float32)):
                q = np.zeros((N_PROMPTS, 2), np.float32)
                m = np.full((N_PROMPTS,), PAD, np.int32)
                q[0] = ((b[0] * gain + px) / self.imgsz,
                        (b[1] * gain + py) / self.imgsz)
                q[1] = ((b[2] * gain + px) / self.imgsz,
                        (b[3] * gain + py) / self.imgsz)
                m[0], m[1] = BOX_TL, BOX_BR
                prompts.append((q, m))
        if not prompts:
            raise ValueError("provide points= and/or bboxes= (or use everything())")
        pts = jnp.asarray(np.stack([q for q, _ in prompts]))
        lbls = jnp.asarray(np.stack([m for _, m in prompts]))
        mem_n = jnp.tile(mem, (len(prompts), 1, 1))
        logits, iou = self._decode(self.params, mem_n, pts, lbls)
        logits, iou = np.asarray(logits), np.asarray(iou)
        best = iou.argmax(1)
        masks = logits[np.arange(len(prompts)), best] > 0
        return masks, iou[np.arange(len(prompts)), best]

    def everything(
        self, source, grid: int = 8, iou_thresh: float = 0.7,
        dedup_iou: float = 0.7,
    ):
        """Automatic mask generation (reference ``sam/amg.py``): a grid x
        grid point lattice prompts the decoder in one batch; masks below
        ``iou_thresh`` predicted quality drop; duplicates suppress by mask
        IoU, best-quality first. Returns (masks (M, S/4, S/4) bool, ious)."""
        if not self.ready:
            self._setup()
        canvas, hw = self._load(source)
        mem = self._encode(self.params, canvas[None])
        g = grid
        n = g * g
        xs, ys = np.meshgrid(
            (np.arange(g) + 0.5) / g, (np.arange(g) + 0.5) / g
        )
        pts = np.zeros((n, N_PROMPTS, 2), np.float32)
        lbl = np.full((n, N_PROMPTS), PAD, np.int32)
        pts[:, 0, 0] = xs.ravel()
        pts[:, 0, 1] = ys.ravel()
        lbl[:, 0] = FG
        logits, iou = self._decode(
            self.params, jnp.tile(mem, (n, 1, 1)), jnp.asarray(pts),
            jnp.asarray(lbl),
        )
        logits, iou = np.asarray(logits), np.asarray(iou)
        best = iou.argmax(1)
        masks = logits[np.arange(n), best] > 0
        quality = iou[np.arange(n), best]
        keep = quality >= iou_thresh
        masks, quality = masks[keep], quality[keep]
        order = np.argsort(-quality)
        out, out_q = [], []
        for i in order:
            m = masks[i]
            a = m.sum()
            if a < 4:
                continue
            dup = any(
                (m & o).sum() / max((m | o).sum(), 1) > dedup_iou for o in out
            )
            if not dup:
                out.append(m)
                out_q.append(quality[i])
        return (
            np.stack(out) if out else np.zeros((0, *masks.shape[1:]), bool),
            np.asarray(out_q, np.float32),
        )


register_task("sam", trainer=SAMTrainer, predictor=SAMPredictor)
