"""Oriented-bounding-box math: probIoU, rotated decode, rotated NMS, loss.

Semantics parity with the reference OBB stack (``utils/metrics.py:178-240``
probiou/_get_covariance_matrix, ``utils/tal.py:366`` dist2rbox + the
RotatedTaskAlignedAssigner overrides, ``utils/loss.py:116-137, 612-710``
RotatedBboxLoss / v8OBBLoss, ``utils/ops.py:146`` nms_rotated). Everything
is padded/static for the TPU: rboxes travel as (..., 5) xywhr tensors and
the rotated NMS reuses the greedy keep-scan over a probIoU matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from kuzu.ops.anchors import bbox2dist, make_anchors
from kuzu.ops.assigner import task_aligned_assign
from kuzu.ops.detect_loss import REG_MAX, _dfl_loss


def _covariance(boxes: jnp.ndarray):
    """(..., 5) xywhr -> (a, b, c) gaussian covariance terms."""
    a = boxes[..., 2] ** 2 / 12.0
    b = boxes[..., 3] ** 2 / 12.0
    r = boxes[..., 4]
    cos, sin = jnp.cos(r), jnp.sin(r)
    cos2, sin2 = cos**2, sin**2
    return (
        a * cos2 + b * sin2,
        a * sin2 + b * cos2,
        (a - b) * cos * sin,
    )


def probiou(
    obb1: jnp.ndarray, obb2: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Probabilistic IoU between rboxes (broadcasting over leading dims)."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _covariance(obb1)
    a2, b2, c2 = _covariance(obb2)
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.clip(a1 * b1 - c1**2, 0.0)
    det2 = jnp.clip(a2 * b2 - c2**2, 0.0)
    t3 = 0.5 * jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(det1 * det2) + eps)
        + eps
    )
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd


def dist2rbox(
    pred_dist: jnp.ndarray,  # (..., 4) ltrb distances in grid units
    pred_angle: jnp.ndarray,  # (..., 1)
    anchor_points: jnp.ndarray,  # (..., 2)
) -> jnp.ndarray:
    """Rotated decode (reference ``tal.py:366``): the lt/rb offset rotates
    by the predicted angle around the anchor; returns (..., 4) xywh (angle
    travels separately)."""
    lt, rb = pred_dist[..., :2], pred_dist[..., 2:]
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    f = (rb - lt) / 2.0
    xf, yf = f[..., :1], f[..., 1:]
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    return jnp.concatenate([jnp.concatenate([x, y], -1) + anchor_points, lt + rb], -1)


def rbox_corners(rboxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) xywhr -> (..., 4, 2) corner points (reference
    ``ops.xywhr2xyxyxyxy``)."""
    ctr = rboxes[..., None, :2]
    w, h, r = rboxes[..., 2], rboxes[..., 3], rboxes[..., 4]
    cos, sin = jnp.cos(r), jnp.sin(r)
    vec1 = jnp.stack([w / 2 * cos, w / 2 * sin], -1)[..., None, :]
    vec2 = jnp.stack([-h / 2 * sin, h / 2 * cos], -1)[..., None, :]
    signs = jnp.asarray(
        [[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]]
    )
    return ctr + signs[..., :1] * vec1 + signs[..., 1:] * vec2


def anchors_in_rboxes(
    anc_points: jnp.ndarray, gt_rboxes: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """(A, 2) x (B, M, 5) -> (B, M, A) bool: anchor center inside the
    rotated box (coordinate-frame test; equivalent to the reference's
    corner cross-product check)."""
    d = anc_points[None, None] - gt_rboxes[..., None, :2]  # (B, M, A, 2)
    r = gt_rboxes[..., 4:5]
    cos, sin = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    u = d[..., 0] * cos[..., 0] + d[..., 1] * sin[..., 0]
    v = -d[..., 0] * sin[..., 0] + d[..., 1] * cos[..., 0]
    return (jnp.abs(u) < gt_rboxes[..., None, 2] / 2 - eps) & (
        jnp.abs(v) < gt_rboxes[..., None, 3] / 2 - eps
    )


def nms_rotated_padded(
    rboxes: jnp.ndarray,  # (B, N, 5) xywhr
    scores: jnp.ndarray,  # (B, N)
    classes: jnp.ndarray,  # (B, N)
    valid: jnp.ndarray,  # (B, N)
    iou_threshold: float = 0.45,
    score_threshold: float = 0.25,
    max_det: int = 300,
    max_nms: int = 2048,
):
    """Greedy rotated NMS over a probIoU matrix (reference ``nms_rotated``,
    ``utils/ops.py:146``): padded, score-sorted outputs like the axis-
    aligned ``nms_padded_batch``."""
    n = rboxes.shape[1]
    scores = jnp.where(valid & (scores > score_threshold), scores, -1.0)
    k = min(max_nms, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(rboxes, order[..., None], axis=1)
    top_classes = jnp.take_along_axis(classes, order, axis=1)
    top_valid = top_scores > 0.0

    iou = probiou(top_boxes[:, :, None], top_boxes[:, None, :])  # (B, k, k)
    same_cls = top_classes[:, :, None] == top_classes[:, None, :]
    iou = jnp.where(same_cls, iou, 0.0)

    def one(iou_m, va):
        def step(suppressed, i):
            alive = ~suppressed[i] & va[i]
            newly = alive & (iou_m[i] > iou_threshold) & (
                jnp.arange(k) > i
            )
            return suppressed | newly, ~suppressed[i] & va[i]

        _, keep = jax.lax.scan(step, jnp.zeros((k,), bool), jnp.arange(k))
        return keep

    keep = jax.vmap(one)(iou, top_valid) & top_valid
    kept_scores = jnp.where(keep, top_scores, -1.0)
    out_scores, kept_order = jax.lax.top_k(kept_scores, min(max_det, k))
    out_boxes = jnp.take_along_axis(top_boxes, kept_order[..., None], axis=1)
    out_classes = jnp.take_along_axis(top_classes, kept_order, axis=1)
    out_valid = out_scores > 0.0
    if max_det > k:
        pad = max_det - k
        out_boxes = jnp.pad(out_boxes, ((0, 0), (0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, ((0, 0), (0, pad)), constant_values=-1.0)
        out_classes = jnp.pad(out_classes, ((0, 0), (0, pad)))
        out_valid = jnp.pad(out_valid, ((0, 0), (0, pad)))
    return {
        "boxes": jnp.where(out_valid[..., None], out_boxes, 0.0),
        "scores": jnp.where(out_valid, out_scores, 0.0),
        "classes": jnp.where(out_valid, out_classes, 0),
        "valid": out_valid,
    }


def obb_loss(
    outputs: dict,  # {"det": [...], "angle": (B, A, 1)}
    gt_labels: jnp.ndarray,  # (B, M)
    gt_rboxes: jnp.ndarray,  # (B, M, 5) xywhr pixels
    mask_gt: jnp.ndarray,  # (B, M)
    nc: int,
    imgsz: int,
    strides: tuple[int, ...] | Sequence[int],
    box_w: float = 7.5,
    cls_w: float = 0.5,
    dfl_w: float = 1.5,
    topk: int = 10,
    reg_max: int = REG_MAX,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """v8OBBLoss: BCE cls over rotated TAL assignment + probIoU box loss +
    DFL on the unrotated ltrb distances (reference ``utils/loss.py:612``)."""
    from kuzu.models.yolo.modules import dfl_expectation

    feats = outputs["det"]
    angle = outputs["angle"].astype(jnp.float32)  # (B, A, 1), radians
    B = feats[0].shape[0]
    flat = [f.reshape(B, -1, f.shape[-1]) for f in feats]
    cat = jnp.concatenate(flat, axis=1).astype(jnp.float32)
    pred_dist = cat[..., : 4 * reg_max]
    pred_logits = cat[..., 4 * reg_max :]

    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = make_anchors(shapes, list(strides))

    dist = dfl_expectation(pred_dist, reg_max)
    pred_rboxes = jnp.concatenate(
        [dist2rbox(dist, angle, anchor_points[None]), angle], -1
    )  # (B, A, 5) grid units
    pred_rboxes_px = jnp.concatenate(
        [pred_rboxes[..., :4] * stride_t[None], angle], -1
    )
    anc_px = anchor_points * stride_t

    pd_scores = jax.nn.sigmoid(pred_logits)
    assign = task_aligned_assign(
        jax.lax.stop_gradient(pd_scores),
        jax.lax.stop_gradient(pred_rboxes_px),
        anc_px,
        gt_labels,
        gt_rboxes,
        mask_gt,
        topk=topk,
        num_classes=nc,
        rotated=True,
    )
    target_scores = assign["target_scores"]
    fg = assign["fg_mask"]
    tgt = assign["target_bboxes"]  # (B, A, 5) px

    score_sum = jnp.maximum(target_scores.sum(), 1.0)
    cls_loss = (
        optax.sigmoid_binary_cross_entropy(pred_logits, target_scores).sum()
        / score_sum
    )

    weight = target_scores.sum(-1) * fg
    tgt_grid = jnp.concatenate(
        [tgt[..., :4] / stride_t[None], tgt[..., 4:]], -1
    )
    iou = probiou(pred_rboxes, tgt_grid)
    box_loss = ((1.0 - iou) * weight).sum() / score_sum

    # DFL on the unrotated xywh -> ltrb distances (reference RotatedBboxLoss)
    cx, cy, w, h = (tgt_grid[..., i] for i in range(4))
    xyxy = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    target_dist = bbox2dist(xyxy, anchor_points[None], reg_max)
    dfl = _dfl_loss(
        pred_dist.reshape(-1, 4, reg_max), target_dist.reshape(-1, 4),
        reg_max=reg_max,
    ).reshape(B, -1)
    dfl_loss = (dfl * weight).sum() / score_sum

    total = box_w * box_loss + cls_w * cls_loss + dfl_w * dfl_loss
    return total, {
        "box_loss": box_loss,
        "cls_loss": cls_loss,
        "dfl_loss": dfl_loss,
        "num_fg": fg.sum().astype(jnp.float32) / B,
    }
