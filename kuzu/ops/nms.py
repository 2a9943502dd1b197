"""Fixed-shape non-maximum suppression for TPU (jit-able, padded outputs).

Capability parity with the reference's ``non_max_suppression``
(``yolov12/ultralytics/utils/ops.py:167-318``, which calls the native
``torchvision.ops.nms`` C++/CUDA kernel), re-designed for XLA:

- everything is static-shape: candidates are reduced to the top ``max_nms`` by
  score, suppression runs over a precomputed IoU matrix with a sequential
  `lax.scan` (O(K) steps of O(K) vector work), and outputs are padded to
  ``max_det`` with a validity mask.
- multi-class behavior uses the reference's class-offset trick (boxes of
  different classes never suppress each other, agnostic=False) without any
  per-class loops.

The padded output contract replaces the reference's ragged per-image lists —
downstream mAP / plotting / serving all consume (boxes, scores, classes, valid).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kuzu.ops.boxes import box_iou_matrix, xywh2xyxy


def _suppress(iou: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS keep-mask over a score-descending IoU matrix (K, K).

    Sequential recurrence: row i is kept iff no kept row j < i overlaps it
    above the threshold. Implemented as a scan carrying the suppressed mask.
    """
    k = iou.shape[0]
    over = iou > iou_threshold

    def step(suppressed, i):
        kept_i = ~suppressed[i]
        # i suppresses later rows only if i itself is kept
        newly = over[i] & kept_i & (jnp.arange(k) > i)
        return suppressed | newly, kept_i

    _, keep = jax.lax.scan(step, jnp.zeros((k,), bool), jnp.arange(k))
    return keep


@partial(
    jax.jit,
    static_argnames=(
        "max_det",
        "max_nms",
        "agnostic",
        "max_wh",
    ),
)
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.25,
    max_det: int = 300,
    max_nms: int = 2048,
    agnostic: bool = False,
    max_wh: int = 7680,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS on one image's padded candidates.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,) confidence.
      classes: (N,) int class ids.
      valid: (N,) bool mask of real candidates.
      max_det: output size (padded).
      max_nms: number of top-score candidates considered (static).

    Returns:
      (boxes (max_det, 4), scores (max_det,), classes (max_det,),
       valid (max_det,) bool) — score-sorted, padded with zeros.
    """
    n = boxes.shape[0]
    scores = jnp.where(valid & (scores > score_threshold), scores, -1.0)
    k = min(max_nms, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_classes = classes[order]
    top_valid = top_scores > 0.0

    # class-offset trick: shift boxes per class so cross-class IoU ~ 0
    if agnostic:
        off_boxes = top_boxes
    else:
        offset = (top_classes.astype(top_boxes.dtype) * max_wh)[:, None]
        off_boxes = top_boxes + offset

    iou = box_iou_matrix(off_boxes, off_boxes)
    # invalid rows should not suppress anything
    iou = jnp.where(top_valid[None, :] & top_valid[:, None], iou, 0.0)
    keep = _suppress(iou, iou_threshold) & top_valid

    # select kept, preserve score order, pad to max_det
    kept_scores = jnp.where(keep, top_scores, -1.0)
    out_scores, kept_order = jax.lax.top_k(kept_scores, min(max_det, k))
    out_boxes = top_boxes[kept_order]
    out_classes = top_classes[kept_order]
    out_valid = out_scores > 0.0
    if max_det > k:  # pad up if max_det exceeds candidate pool
        pad = max_det - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad), constant_values=-1.0)
        out_classes = jnp.pad(out_classes, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad))
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    out_classes = jnp.where(out_valid, out_classes, 0)
    return out_boxes, out_scores, out_classes, out_valid


@partial(
    jax.jit,
    static_argnames=("max_det", "max_nms", "agnostic", "multi_label", "in_format"),
)
def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 2048,
    agnostic: bool = False,
    multi_label: bool = False,
    in_format: str = "xywh",
) -> dict[str, jnp.ndarray]:
    """Batched NMS over raw detector output.

    Args:
      prediction: (B, 4 + nc, A) raw head output — box (xywh or xyxy per
        ``in_format``) + per-class scores, matching the reference's
        ``Detect`` head layout (``ops.py:167``).

    Returns dict of padded arrays:
      ``boxes`` (B, max_det, 4) xyxy, ``scores`` (B, max_det),
      ``classes`` (B, max_det) int32, ``valid`` (B, max_det) bool.
    """
    pred = jnp.transpose(prediction, (0, 2, 1))  # (B, A, 4+nc)
    boxes = pred[..., :4]
    if in_format == "xywh":
        boxes = xywh2xyxy(boxes)
    cls_scores = pred[..., 4:]
    if multi_label and cls_scores.shape[-1] > 1:
        # flatten (anchor, class) pairs into candidates
        b, a, nc = cls_scores.shape
        boxes = jnp.repeat(boxes, nc, axis=1)
        scores = cls_scores.reshape(b, a * nc)
        classes = jnp.tile(jnp.arange(nc, dtype=jnp.int32), (b, a))
    else:
        scores = cls_scores.max(axis=-1)
        classes = cls_scores.argmax(axis=-1).astype(jnp.int32)
    valid = jnp.ones(scores.shape, bool)

    run = jax.vmap(
        lambda bx, sc, cl, va: nms_padded(
            bx,
            sc,
            cl,
            va,
            iou_threshold=iou_thres,
            score_threshold=conf_thres,
            max_det=max_det,
            max_nms=max_nms,
            agnostic=agnostic,
        )
    )
    ob, os_, oc, ov = run(boxes, scores, classes, valid)
    return {"boxes": ob, "scores": os_, "classes": oc, "valid": ov}
