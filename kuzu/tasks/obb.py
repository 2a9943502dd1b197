"""Oriented-bounding-box task (reference ``models/yolo/obb/*`` +
``OBBModel``, loss ``v8OBBLoss``): rotated TAL assignment, probIoU box
loss, rotated NMS, xywhr predictions."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.api.model import register_task
from kuzu.data.loader import DataLoader
from kuzu.data.yolo_dataset import YoloOBBDataset, load_dataset_yaml
from kuzu.models.yolo.modules import dfl_expectation
from kuzu.ops.anchors import make_anchors
from kuzu.ops.obb import dist2rbox, nms_rotated_padded, obb_loss, rbox_corners
from kuzu.tasks.detect import DetectPredictor, DetectTrainer, DetectValidator

REG_MAX = 16


class OBBTrainer(DetectTrainer):
    head_kind = "obb"

    def build_datasets(self):
        cfg = self.cfg
        imgsz = int(cfg.get("imgsz", 640))
        max_boxes = int(cfg.get("max_boxes", 300))
        self.data_spec = load_dataset_yaml(cfg.data)
        mk = lambda split, augment: YoloOBBDataset(
            self.data_spec, split=split, imgsz=imgsz, max_boxes=max_boxes,
            augment=augment, seed=int(cfg.get("seed", 0)),
        )
        self.train_ds = mk("train", bool(cfg.get("augment", True)))
        try:
            self.val_ds = mk("val", False)
        except FileNotFoundError:
            self.val_ds = mk("train", False)
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

    def loss_fn(self, params, model_state, batch, rng):
        variables = {"params": params, **model_state}
        outputs, mutated = self.detector.apply(
            variables, batch["image"], train=True, mutable=["batch_stats"]
        )
        total, metrics = obb_loss(
            outputs,
            batch["gt_labels"],
            batch["gt_rboxes"],
            batch["mask_gt"],
            nc=self.detector.nc,
            imgsz=self.imgsz,
            strides=tuple(self.detector.strides),
            box_w=float(self.cfg.get("box", 7.5)),
            cls_w=float(self.cfg.get("cls", 0.5)),
            dfl_w=float(self.cfg.get("dfl", 1.5)),
            reg_max=self.detector.spec.reg_max,
        )
        return total, (metrics, dict(mutated))

    def validate(self, state) -> dict[str, float]:
        """Rotated validation: full mAP50/mAP50-95 with probIoU as the
        matching similarity — the reference ``OBBValidator`` feeds
        ``batch_probiou`` into the shared mAP machinery
        (``models/yolo/obb/val.py:90-103``); here the probIoU matrix goes
        through ``DetMetrics(iou_matrix=...)``. Legacy probIoU@0.5 P/R/F1
        are kept alongside."""
        from kuzu.core.metrics import DetMetrics
        from kuzu.ops.obb import probiou

        params = state.ema_params if state.ema_params is not None else state.params
        variables = {"params": params, **(state.model_state or {})}
        fwd = getattr(self, "_val_fwd", None)
        if fwd is None:
            conf = float(self.cfg.get("conf") or 0.001)
            iou_t = float(self.cfg.get("iou", 0.7))
            max_det = int(self.cfg.get("max_det", 300))

            def _fwd(variables, images):
                outputs = self.detector.infer(variables, images)
                return decode_rotated(
                    self.detector, outputs, conf, iou_t, max_det
                )

            fwd = self._val_fwd = jax.jit(_fwd)

        from kuzu.tasks.base import resolve_val_batches

        dm = DetMetrics(use_scipy=bool(self.cfg.get("val_scipy", False)))
        tp = fp = n_gt = 0
        max_batches = resolve_val_batches(self.cfg, self.val_loader)
        for bi, batch in enumerate(self.val_loader):
            if bi >= max_batches:
                break
            mask = batch.pop("sample_mask", np.ones(len(batch["image"]), np.float32))
            out = fwd(variables, jnp.asarray(batch["image"]))
            out = {k: np.asarray(v) for k, v in out.items()}
            for i in range(len(batch["image"])):
                if mask[i] == 0:
                    continue
                pv = out["valid"][i]
                pb = out["boxes"][i][pv]
                pc = out["classes"][i][pv]
                ps = out["scores"][i][pv]
                gv = np.asarray(batch["mask_gt"][i], bool)
                gb = np.asarray(batch["gt_rboxes"][i])[gv]
                gc = np.asarray(batch["gt_labels"][i])[gv]
                n_gt += len(gb)
                if len(pb) and len(gb):
                    iou = np.asarray(
                        probiou(
                            jnp.asarray(gb)[:, None, :],
                            jnp.asarray(pb)[None, :, :],
                        )
                    )
                else:
                    iou = np.zeros((len(gb), len(pb)), np.float32)
                dm.update(
                    pb, ps, pc, np.ones(len(pb), bool),
                    gb, gc, np.ones(len(gb), bool),
                    iou_matrix=iou,
                )
                if not len(pb):
                    continue
                if not len(gb):
                    fp += len(pb)
                    continue
                cio = iou * (gc[:, None] == pc[None, :])
                used = np.zeros(len(gb), bool)
                for j in np.argsort(-ps):
                    g = int(np.argmax(cio[:, j]))
                    if cio[g, j] >= 0.5 and not used[g]:
                        used[g] = True
                        tp += 1
                    else:
                        fp += 1
        precision = tp / max(tp + fp, 1)
        recall = tp / max(n_gt, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)
        res = dm.compute()
        return {
            "map50": res["map50"], "map": res["map"],
            "precision": precision, "recall": recall, "f1": f1,
            "fitness": res["fitness"],
        }


def decode_rotated(detector, outputs, conf, iou_t, max_det):
    """Raw OBB maps -> rotated NMS survivors ((B, D, 5) xywhr pixels)."""
    feats = outputs["det"]
    angle = outputs["angle"].astype(jnp.float32)
    B = feats[0].shape[0]
    flat = [f.reshape(B, -1, f.shape[-1]) for f in feats]
    cat = jnp.concatenate(flat, axis=1).astype(jnp.float32)
    rm = detector.spec.reg_max
    pred_dist = cat[..., : 4 * rm]
    cls = jax.nn.sigmoid(cat[..., 4 * rm :])
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = make_anchors(shapes, list(detector.strides))
    dist = dfl_expectation(pred_dist, rm)
    rb = dist2rbox(dist, angle, anchor_points[None]) * stride_t[None]
    rboxes = jnp.concatenate([rb, angle], -1)  # (B, A, 5) px
    scores = cls.max(-1)
    classes = (
        cls.argmax(-1).astype(jnp.int32)
        if cls.shape[-1] > 1
        else jnp.zeros(scores.shape, jnp.int32)
    )
    return nms_rotated_padded(
        rboxes, scores, classes, jnp.ones(scores.shape, bool),
        iou_threshold=iou_t, score_threshold=conf, max_det=max_det,
    )


class OBBoxes:
    """Rotated detections (reference ``engine/results.py`` OBB)."""

    def __init__(self, data: np.ndarray, conf: np.ndarray, cls: np.ndarray):
        self.data = data  # (n, 5) xywhr
        self.conf = conf
        self.cls = cls

    def __len__(self) -> int:
        return len(self.data)

    @property
    def xywhr(self) -> np.ndarray:
        return self.data

    @property
    def xyxyxyxy(self) -> np.ndarray:
        return np.asarray(rbox_corners(jnp.asarray(self.data)))


class OBBPredictor(DetectPredictor):
    def _setup(self):
        super()._setup()
        conf = float(self.cfg.get("conf") or 0.25)
        iou_t = float(self.cfg.get("iou", 0.7))
        max_det = int(self.cfg.get("max_det", 300))

        def _fwd(variables, images):
            outputs = self.detector.infer(variables, images)
            return decode_rotated(self.detector, outputs, conf, iou_t, max_det)

        self._fwd_jit = jax.jit(_fwd)
        self._fwd = lambda images: self._fwd_jit(self.variables, self._put(images))

    def _predict_frames(self, frames: list) -> list:
        from kuzu.api.results import Boxes, Results
        from kuzu.data.yolo_dataset import letterbox_np

        images, meta = [], []
        for f in frames:
            h, w = f.image.shape[:2]
            canvas, gain, (px, py) = letterbox_np(f.image, self.imgsz)
            images.append(canvas)  # uint8; the model normalizes on-device
            meta.append((h, w, gain, px, py))
        from kuzu.data.loader import next_bucket

        npad = next_bucket(len(images), min_bucket=self.min_bucket)
        images.extend([np.zeros_like(images[0])] * (npad - len(images)))
        out = self._fwd(np.stack(images))
        out = {k: np.asarray(v) for k, v in out.items()}
        names = getattr(self, "names", {})
        results = []
        for i, (h, w, gain, px, py) in enumerate(meta):
            v = out["valid"][i]
            rb = out["boxes"][i][v].copy()
            rb[:, 0] = (rb[:, 0] - px) / gain
            rb[:, 1] = (rb[:, 1] - py) / gain
            rb[:, 2:4] /= gain
            conf = out["scores"][i][v]
            cls = out["classes"][i][v]
            # axis-aligned hull for the generic Boxes/plot surface
            if len(rb):
                corners = np.asarray(rbox_corners(jnp.asarray(rb)))
                xyxy = np.concatenate(
                    [corners.min(1), corners.max(1)], axis=1
                ).clip(0, max(h, w))
            else:
                xyxy = np.zeros((0, 4), np.float32)
            r = Results(
                orig_img=frames[i].image, path=frames[i].path, names=names,
                boxes=Boxes(xyxy, conf, cls, (h, w)),
            )
            r.obb = OBBoxes(rb, conf, cls)
            results.append(r)
        return results


class OBBValidator(DetectValidator):
    pass


register_task(
    "obb",
    trainer=OBBTrainer,
    validator=OBBValidator,
    predictor=OBBPredictor,
)
