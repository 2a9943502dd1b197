"""Instance-segmentation task (reference ``models/yolo/segment/*`` +
``SegmentationModel``, ``nn/tasks.py:391``): the detect stack plus
prototype-mask training (``v8SegmentationLoss``) and on-device mask
composition at predict time.

Masks never leave fixed shapes: training consumes one overlap-index map per
image; prediction composes sigmoid(coeffs @ protos) for the padded NMS
survivors inside the same jit as decode+NMS (``return_indices`` recovers
the kept anchors' coefficient rows).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.api.model import register_task
from kuzu.data.loader import DataLoader
from kuzu.data.yolo_dataset import YoloSegmentDataset
from kuzu.ops.nms import non_max_suppression
from kuzu.ops.seg_loss import crop_loss_to_box, segmentation_loss
from kuzu.tasks.detect import DetectPredictor, DetectTrainer, DetectValidator


class SegmentTrainer(DetectTrainer):
    head_kind = "segment"

    def build_datasets(self):
        cfg = self.cfg
        imgsz = int(cfg.get("imgsz", 640))
        max_boxes = int(cfg.get("max_boxes", 300))
        from kuzu.data.yolo_dataset import load_dataset_yaml

        self.data_spec = load_dataset_yaml(cfg.data)
        self.train_ds = YoloSegmentDataset(
            self.data_spec, split="train", imgsz=imgsz, max_boxes=max_boxes,
            augment=bool(cfg.get("augment", True)),
            seed=int(cfg.get("seed", 0)),
        )
        try:
            self.val_ds = YoloSegmentDataset(
                self.data_spec, split="val", imgsz=imgsz,
                max_boxes=max_boxes, augment=False,
            )
        except FileNotFoundError:
            self.val_ds = YoloSegmentDataset(
                self.data_spec, split="train", imgsz=imgsz,
                max_boxes=max_boxes, augment=False,
            )
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
        total, metrics = segmentation_loss(
            outputs,
            batch["gt_labels"],
            batch["gt_boxes"],
            batch["masks"],
            batch["mask_gt"],
            nc=self.detector.nc,
            imgsz=self.imgsz,
            strides=tuple(self.detector.strides),
            box_w=float(self.cfg.get("box", 7.5)),
            cls_w=float(self.cfg.get("cls", 0.5)),
            dfl_w=float(self.cfg.get("dfl", 1.5)),
            max_fg=int(self.cfg.get("seg_max_fg", 128)),
            reg_max=self.detector.spec.reg_max,
        )
        return total, (metrics, dict(mutated))


def compose_masks(
    outputs: dict,
    nms_out: dict,
    imgsz: int,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Per-kept-box binary masks at prototype resolution (B, max_det, Hp, Wp).

    sigmoid(coeffs[kept] @ protos), cropped to the kept box (reference
    ``utils/ops.py process_mask``); all shapes static.
    """
    coeffs = outputs["coeffs"]  # (B, A, nm)
    protos = outputs["protos"]  # (B, Hp, Wp, nm)
    Hp, Wp = protos.shape[1], protos.shape[2]
    idx = nms_out["indices"]  # (B, max_det)
    sel = jnp.take_along_axis(coeffs, idx[..., None], axis=1)  # (B, D, nm)
    logits = jnp.einsum(
        "bdn,bhwn->bdhw", sel, protos, preferred_element_type=jnp.float32
    )
    masks = jax.nn.sigmoid(logits)
    mask_boxes = nms_out["boxes"] / imgsz * jnp.asarray(
        [Wp, Hp, Wp, Hp], jnp.float32
    )
    masks = crop_loss_to_box(masks, mask_boxes)
    return (masks > threshold) & nms_out["valid"][..., None, None]


class SegmentPredictor(DetectPredictor):
    """Detect predictor whose jitted forward also returns composed masks."""

    def _setup(self):
        super()._setup()
        conf = float(self.cfg.get("conf") or 0.25)
        iou_t = float(self.cfg.get("iou", 0.7))
        max_det = int(self.cfg.get("max_det", 300))
        imgsz = self.imgsz

        def _fwd(variables, images):
            outputs = self.detector.infer(variables, images)
            pred = self.detector.decode(outputs, imgsz=imgsz)
            out = non_max_suppression(
                pred, conf_thres=conf, iou_thres=iou_t, max_det=max_det,
                return_indices=True,
            )
            out["masks"] = compose_masks(outputs, out, imgsz)
            return out

        self._fwd_jit = jax.jit(_fwd)
        self._fwd = lambda images: self._fwd_jit(self.variables, self._put(images))

    def _attach_extras(self, result, out, i, valid, orig_shape, gain, pad) -> None:
        from kuzu.api.results import Masks

        m = np.asarray(out["masks"][i][valid])  # proto res over the
        # letterboxed square; crop to the content region so Masks.full()
        # maps onto the original frame
        if len(m):
            Hp, Wp = m.shape[1:]
            px, py = pad
            h, w = orig_shape
            sx, sy = Wp / (self.imgsz / 1.0), Hp / (self.imgsz / 1.0)
            x1 = int(round(px * sx))
            y1 = int(round(py * sy))
            x2 = max(x1 + 1, int(round((px + w * gain) * sx)))
            y2 = max(y1 + 1, int(round((py + h * gain) * sy)))
            m = m[:, y1:y2, x1:x2]
        result.masks = Masks(m, orig_shape)


class SegmentValidator(DetectValidator):
    pass


register_task(
    "segment",
    trainer=SegmentTrainer,
    validator=SegmentValidator,
    predictor=SegmentPredictor,
)
