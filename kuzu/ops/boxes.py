"""Box geometry ops (pure JAX, static shapes, vmap/jit friendly).

Capability parity with the reference's box utilities
(``yolov12/ultralytics/utils/ops.py`` box conversions / ``utils/metrics.py``
``bbox_iou``/``box_iou`` and the project's ``src/utils/metrics.py`` IoU), but
written TPU-first: everything operates on padded fixed-shape arrays and
broadcasts instead of looping.

Conventions:
- ``xyxy`` boxes are ``(x1, y1, x2, y2)``; ``xywh`` boxes are center-format.
- A "padded" box set is ``(N, 4)`` with a companion boolean/float mask; invalid
  rows are all-zero and must be masked by the caller.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """Center (x, y, w, h) -> corner (x1, y1, x2, y2). Works on (..., 4)."""
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """Corner (x1, y1, x2, y2) -> center (x, y, w, h). Works on (..., 4)."""
    p1, p2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(p1 + p2) * 0.5, p2 - p1], axis=-1)


def box_area(box: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, (..., 4) -> (...)."""
    wh = jnp.clip(box[..., 2:4] - box[..., 0:2], 0, None)
    return wh[..., 0] * wh[..., 1]


def clip_boxes(boxes: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to an image of (height, width)."""
    h, w = shape
    lo = jnp.array([0.0, 0.0, 0.0, 0.0], dtype=boxes.dtype)
    hi = jnp.array([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def scale_boxes(
    boxes: jnp.ndarray,
    from_shape: tuple[int, int],
    to_shape: tuple[int, int],
    ratio_pad: tuple[float, tuple[float, float]] | None = None,
    clip: bool = True,
) -> jnp.ndarray:
    """Rescale xyxy boxes from a letterboxed image back to the original frame.

    Mirrors the semantics of the reference's ``scale_boxes``
    (``yolov12/ultralytics/utils/ops.py:92``): undo center padding, divide by
    gain, optionally clip. ``from_shape``/``to_shape`` are (h, w).
    """
    if ratio_pad is None:
        gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
        pad_x = (from_shape[1] - to_shape[1] * gain) / 2.0
        pad_y = (from_shape[0] - to_shape[0] * gain) / 2.0
    else:
        gain = ratio_pad[0]
        pad_x, pad_y = ratio_pad[1]
    pad = jnp.array([pad_x, pad_y, pad_x, pad_y], dtype=boxes.dtype)
    boxes = (boxes - pad) / gain
    if clip:
        boxes = clip_boxes(boxes, to_shape)
    return boxes


def box_iou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of two xyxy box sets: (N, 4) x (M, 4) -> (N, M).

    Parity with ``utils/metrics.py:box_iou`` (reference) — used by NMS, the
    validator's prediction<->GT matching, and mAP computation.
    """
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1)[:, None] + box_area(boxes2)[None, :] - inter
    return inter / (union + EPS)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = False,
    giou: bool = False,
    diou: bool = False,
    ciou: bool = False,
) -> jnp.ndarray:
    """Elementwise IoU / GIoU / DIoU / CIoU between broadcast-compatible boxes.

    Semantics follow the reference ``bbox_iou``
    (``yolov12/ultralytics/utils/metrics.py:52``-style): CIoU adds the center
    distance and aspect-ratio consistency penalties. Inputs are (..., 4).
    """
    if xywh:
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1

    inter_w = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None)
    inter_h = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None)
    inter = inter_w * inter_h
    union = w1 * h1 + w2 * h2 - inter + EPS
    iou = inter / union

    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # enclosing box w
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # enclosing box h
    if giou:
        c_area = cw * ch + EPS
        return iou - (c_area - union) / c_area

    c2 = cw * cw + ch * ch + EPS  # enclosing diagonal^2
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4.0
    if diou:
        return iou - rho2 / c2
    # CIoU
    v = (4.0 / (jnp.pi**2)) * (
        jnp.arctan(w2 / (h2 + EPS)) - jnp.arctan(w1 / (h1 + EPS))
    ) ** 2
    # alpha is treated as a constant w.r.t. gradients in the reference too;
    # guard the v=0, iou~1 case where float32 rounding can produce 0/0
    import jax

    alpha = jax.lax.stop_gradient(
        jnp.where(v > 0, v / jnp.maximum(v - iou + (1.0 + EPS), EPS), 0.0)
    )
    return iou - (rho2 / c2 + v * alpha)
