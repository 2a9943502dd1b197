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
    (XLA reference path; the TPU hot path is ``pallas_nms.pallas_suppress``.)
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


def batched_suppress(
    boxes: jnp.ndarray,  # (B, K, 4) score-desc sorted
    valid: jnp.ndarray,  # (B, K) bool
    iou_threshold: float,
    backend: str = "auto",
) -> jnp.ndarray:
    """Batched keep-mask; Pallas kernel on TPU, scan elsewhere."""
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from kuzu.ops.pallas_nms import LANES, pallas_suppress

        b, k, _ = boxes.shape
        pad = (-k) % LANES
        if pad:
            boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        keep = pallas_suppress(boxes, valid, iou_threshold)
        return keep[:, :k] if pad else keep

    def one(bx, va):
        iou = box_iou_matrix(bx, bx)
        iou = jnp.where(va[None, :] & va[:, None], iou, 0.0)
        return _suppress(iou, iou_threshold) & va

    return jax.vmap(one)(boxes, valid)


@partial(
    jax.jit,
    static_argnames=(
        "iou_threshold", "score_threshold", "max_det", "max_nms",
        "agnostic", "max_wh", "backend", "return_indices",
    ),
)
def nms_padded_batch(
    boxes: jnp.ndarray,  # (B, N, 4) xyxy
    scores: jnp.ndarray,  # (B, N)
    classes: jnp.ndarray,  # (B, N) int
    valid: jnp.ndarray,  # (B, N) bool
    iou_threshold: float = 0.45,
    score_threshold: float = 0.25,
    max_det: int = 300,
    max_nms: int = 2048,
    agnostic: bool = False,
    max_wh: int = 7680,
    backend: str = "auto",
    return_indices: bool = False,
):
    """Batched NMS over padded candidates; returns padded, score-sorted
    (boxes (B, max_det, 4), scores, classes, valid) — plus the kept
    candidates' ORIGINAL input indices when ``return_indices=True``
    (composite heads gather per-anchor payloads like mask coefficients)."""
    n = boxes.shape[1]
    scores = jnp.where(valid & (scores > score_threshold), scores, -1.0)
    k = min(max_nms, n)
    top_scores, order = jax.lax.top_k(scores, k)  # (B, k)
    top_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    top_classes = jnp.take_along_axis(classes, order, axis=1)
    top_valid = top_scores > 0.0

    # class-offset trick: shift boxes per class so cross-class IoU ~ 0
    if agnostic:
        off_boxes = top_boxes
    else:
        offset = (top_classes.astype(top_boxes.dtype) * max_wh)[..., None]
        off_boxes = top_boxes + offset

    keep = batched_suppress(off_boxes, top_valid, iou_threshold, backend) & top_valid

    # select kept, preserve score order, pad to max_det
    kept_scores = jnp.where(keep, top_scores, -1.0)
    out_scores, kept_order = jax.lax.top_k(kept_scores, min(max_det, k))
    out_boxes = jnp.take_along_axis(top_boxes, kept_order[..., None], axis=1)
    out_classes = jnp.take_along_axis(top_classes, kept_order, axis=1)
    out_valid = out_scores > 0.0
    if max_det > k:  # pad up if max_det exceeds candidate pool
        pad = max_det - k
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)), constant_values=-1.0)
        out_classes = jnp.pad(out_classes, ((0, 0), (0, pad)))
        out_valid = jnp.pad(out_valid, ((0, 0), (0, pad)))
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    out_boxes = jnp.where(out_valid[..., None], out_boxes, 0.0)
    out_classes = jnp.where(out_valid, out_classes, 0)
    if return_indices:
        out_idx = jnp.take_along_axis(order, kept_order, axis=1)
        if max_det > k:
            out_idx = jnp.pad(out_idx, ((0, 0), (0, max_det - k)))
        out_idx = jnp.where(out_valid, out_idx, 0)
        return out_boxes, out_scores, out_classes, out_valid, out_idx
    return out_boxes, out_scores, out_classes, out_valid


@partial(
    jax.jit,
    static_argnames=(
        "iou_threshold", "score_threshold", "max_det", "max_nms",
        "agnostic", "max_wh", "backend",
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
    backend: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-image NMS on padded candidates (see ``nms_padded_batch``)."""
    ob, os_, oc, ov = nms_padded_batch(
        boxes[None],
        scores[None],
        classes[None],
        valid[None],
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        max_det=max_det,
        max_nms=max_nms,
        agnostic=agnostic,
        max_wh=max_wh,
        backend=backend,
    )
    return ob[0], os_[0], oc[0], ov[0]


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "max_det", "max_nms", "agnostic",
        "multi_label", "in_format", "return_indices",
    ),
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
    return_indices: bool = False,
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
    elif cls_scores.shape[-1] == 1:
        # single-class (the production kuzushiji char detector): no argmax
        # — besides being free, argmax over a size-1 axis lowers to a
        # variadic mhlo.reduce that the TFLite converter cannot legalize
        scores = cls_scores[..., 0]
        classes = jnp.zeros(scores.shape, jnp.int32)
    else:
        scores = cls_scores.max(axis=-1)
        classes = cls_scores.argmax(axis=-1).astype(jnp.int32)
    valid = jnp.ones(scores.shape, bool)

    out = nms_padded_batch(
        boxes,
        scores,
        classes,
        valid,
        iou_threshold=iou_thres,
        score_threshold=conf_thres,
        max_det=max_det,
        max_nms=max_nms,
        agnostic=agnostic,
        return_indices=return_indices,
    )
    res = {
        "boxes": out[0], "scores": out[1], "classes": out[2], "valid": out[3],
    }
    if return_indices:
        # candidate index -> anchor index (multi_label flattens (A, nc))
        idx = out[4]
        res["indices"] = (
            idx // cls_scores.shape[-1]
            if multi_label and cls_scores.shape[-1] > 1 else idx
        )
    return res


def nms_free_select(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    max_det: int = 300,
    in_format: str = "xywh",
) -> dict[str, jnp.ndarray]:
    """NMS-free selection for the v10 one2one head (reference
    ``Detect.postprocess``, ``nn/modules/head.py:151``): top ``max_det``
    anchors by max-class score, then a flattened (anchor, class) top-k over
    the survivors — no suppression, the one2one assignment already yields
    one prediction per object. Same padded output contract as
    ``non_max_suppression``.
    """
    import jax

    pred = jnp.transpose(prediction, (0, 2, 1))  # (B, A, 4+nc)
    boxes = pred[..., :4]
    if in_format == "xywh":
        boxes = xywh2xyxy(boxes)
    scores = pred[..., 4:]  # (B, A, nc)
    b, a, nc = scores.shape
    k = min(max_det, a)
    _, anc_idx = jax.lax.top_k(scores.max(axis=-1), k)  # (B, k)
    sel_boxes = jnp.take_along_axis(boxes, anc_idx[..., None], axis=1)
    sel_scores = jnp.take_along_axis(scores, anc_idx[..., None], axis=1)
    vals, flat_idx = jax.lax.top_k(sel_scores.reshape(b, k * nc), k)
    out_boxes = jnp.take_along_axis(
        sel_boxes, (flat_idx // nc)[..., None], axis=1
    )
    classes = (flat_idx % nc).astype(jnp.int32)
    valid = vals > conf_thres
    if k < max_det:  # pad to the static contract
        pad = max_det - k
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
        classes = jnp.pad(classes, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    return {"boxes": out_boxes, "scores": vals, "classes": classes,
            "valid": valid}
