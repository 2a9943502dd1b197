"""FastSAM: promptable everything-segmentation over the YOLO-seg engine.

Capability parity with the reference FastSAM family
(``yolov12/ultralytics/models/fastsam/predict.py:14-148``): run the
segmentation model class-agnostic in "everything" mode, snap
near-full-frame boxes to the exact frame, then select instances by
prompt —

- **box prompts**: the instance whose mask maximizes IoU with the prompt
  box (``predict.py:76-85``);
- **point prompts**: instances whose mask contains a foreground point
  (and drop ones hit only by background points, ``predict.py:86-100``);
- **text prompts**: the reference ranks crops with CLIP
  (``predict.py:122``) — CLIP weights cannot exist in this zero-egress
  environment, so ``texts=`` raises with the same contract documented.

TPU notes: the heavy work (seg forward + NMS + prototype-mask
composition) is the existing jitted ``SegmentPredictor`` program; prompt
selection is tiny host-side numpy over the already-padded mask tensors.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np


def adjust_boxes_to_border(
    boxes: np.ndarray, shape: tuple[int, int], threshold: int = 20
) -> np.ndarray:
    """Snap box edges within ``threshold`` px of the frame to the frame
    (reference ``fastsam/utils.py::adjust_bboxes_to_image_border``)."""
    h, w = shape
    out = boxes.copy()
    out[:, 0] = np.where(out[:, 0] < threshold, 0, out[:, 0])
    out[:, 1] = np.where(out[:, 1] < threshold, 0, out[:, 1])
    out[:, 2] = np.where(out[:, 2] > w - threshold, w, out[:, 2])
    out[:, 3] = np.where(out[:, 3] > h - threshold, h, out[:, 3])
    return out


def _subset_result(result, idx: np.ndarray):
    """New Results holding only the selected instances."""
    from kuzu.api.results import Boxes, Masks, Results

    b = result.boxes
    sel = Results(
        orig_img=result.orig_img,
        path=result.path,
        names=result.names,
        boxes=Boxes(b.xyxy[idx], b.conf[idx], b.cls[idx], b.orig_shape),
        speed=result.speed,
    )
    if result.masks is not None:
        sel.masks = Masks(result.masks.data[idx], result.masks.orig_shape)
    return sel


class FastSAMPredictor:
    """Everything-mode segmentation + prompt selection.

    ``model`` is any kuzu segment run directory (or hub:// name). The
    reference ships FastSAM-s/x as YOLOv8-seg weights trained
    class-agnostic on SA-1B; under zero-egress kuzu trains the same
    architecture on its own data (``Model("yolov8n-seg", task="segment")``).
    """

    def __init__(self, cfg):
        from kuzu.tasks.segment import SegmentPredictor

        # everything mode: dense proposals, permissive NMS
        overrides = dict(cfg)
        overrides.setdefault("conf", 0.25)
        overrides.setdefault("iou", 0.9)
        overrides.setdefault("max_det", 300)
        from kuzu.core.config import load_config

        self._seg = SegmentPredictor(load_config(overrides=overrides))
        self.border_threshold = int(cfg.get("border", 20) or 20)

    def __call__(
        self,
        source,
        bboxes: Sequence | None = None,
        points: Sequence | None = None,
        labels: Sequence | None = None,
        texts: Any = None,
    ):
        results = self._seg(source)
        for r in results:
            if len(r.boxes):
                r.boxes.xyxy[:] = adjust_boxes_to_border(
                    r.boxes.xyxy, r.boxes.orig_shape, self.border_threshold
                )
        return self.prompt(
            results, bboxes=bboxes, points=points, labels=labels, texts=texts
        )

    def prompt(
        self, results, bboxes=None, points=None, labels=None, texts=None
    ):
        """Select instances by prompt (reference ``predict.py:47-120``)."""
        if texts is not None:
            raise NotImplementedError(
                "text prompts rank crops with CLIP "
                "(reference fastsam/predict.py:122); CLIP weights are not "
                "available in this environment — use bboxes/points prompts"
            )
        if bboxes is None and points is None:
            return results
        out = []
        for r in results:
            if len(r.boxes) == 0 or r.masks is None or len(r.masks) == 0:
                out.append(r)
                continue
            masks = r.masks.full()  # (n, H, W) bool in the original frame
            n = len(masks)
            idx = np.zeros(n, bool)
            if bboxes is not None:
                bb = np.atleast_2d(np.asarray(bboxes, np.int32))
                areas = (bb[:, 3] - bb[:, 1]) * (bb[:, 2] - bb[:, 0])
                inter = np.stack(
                    [
                        masks[:, b[1] : b[3], b[0] : b[2]].sum((1, 2))
                        for b in bb
                    ]
                )  # (P, n)
                full = masks.sum((1, 2))[None]
                union = areas[:, None] + full - inter
                idx[np.argmax(inter / np.maximum(union, 1), axis=1)] = True
            if points is not None:
                pts = np.atleast_2d(np.asarray(points, np.int32))
                lbl = (
                    np.ones(len(pts), np.int32)
                    if labels is None
                    else np.asarray(labels, np.int32)
                )
                assert len(lbl) == len(pts), (len(lbl), len(pts))
                # all-negative points: start from everything and remove
                pidx = np.full(n, bool(lbl.sum() == 0))
                for (x, y), l in zip(pts, lbl):
                    hit = masks[:, y, x]
                    pidx[hit] = bool(l)
                idx |= pidx
            out.append(_subset_result(r, idx))
        return out


def register():
    """Register the 'fastsam' task (predictor-only: training IS the
    segment task with nc=1 — reference FastSAM trains ultralytics-seg)."""
    from kuzu.api.model import register_task
    from kuzu.tasks.segment import SegmentTrainer, SegmentValidator

    register_task(
        "fastsam",
        trainer=SegmentTrainer,
        predictor=FastSAMPredictor,
        validator=SegmentValidator,
    )


register()
