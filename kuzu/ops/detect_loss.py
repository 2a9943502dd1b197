"""v8-style detection loss: BCE cls + CIoU box + DFL, TAL-assigned.

Semantics parity with the reference ``v8DetectionLoss`` / ``BboxLoss`` /
``DFLoss`` (``yolov12/ultralytics/utils/loss.py:65-262``): class BCE against
task-aligned soft targets normalized by total target score; CIoU loss and
distribution-focal loss on foreground anchors weighted by their target
scores. Targets arrive padded (B, M, 4) + mask — no ragged preprocessing.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from kuzu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from kuzu.ops.assigner import task_aligned_assign
from kuzu.ops.boxes import bbox_iou
from kuzu.models.yolo.modules import dfl_expectation

REG_MAX = 16


def _dfl_loss(
    pred_dist: jnp.ndarray,  # (N, 4, reg_max) logits
    target: jnp.ndarray,  # (N, 4) continuous distances in [0, reg_max-1)
    reg_max: int = REG_MAX,
) -> jnp.ndarray:
    """Distribution focal loss: CE against the two integer bins around the
    target, linearly weighted (reference ``DFLoss.__call__``)."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    tl = jnp.clip(tl, 0, reg_max - 1)
    tr = jnp.clip(tr, 0, reg_max - 1)
    ce_l = optax.softmax_cross_entropy_with_integer_labels(pred_dist, tl)
    ce_r = optax.softmax_cross_entropy_with_integer_labels(pred_dist, tr)
    return (ce_l * wl + ce_r * wr).mean(-1)  # (N,)


@partial(
    jax.jit,
    static_argnames=("nc", "imgsz", "strides", "topk", "return_assign", "reg_max"),
)
def detection_loss(
    feats: Sequence[jnp.ndarray],  # per-level raw maps (B, H, W, 4*reg_max+nc)
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels
    mask_gt: jnp.ndarray,  # (B, M) bool
    nc: int,
    imgsz: int,
    strides: tuple[int, ...],
    box_w: float = 7.5,
    cls_w: float = 0.5,
    dfl_w: float = 1.5,
    topk: int = 10,
    return_assign: bool = False,
    reg_max: int = REG_MAX,
):
    B = feats[0].shape[0]
    flat = [f.reshape(B, -1, f.shape[-1]) for f in feats]
    cat = jnp.concatenate(flat, axis=1).astype(jnp.float32)  # (B, A, no)
    pred_dist = cat[..., : 4 * reg_max]
    pred_logits = cat[..., 4 * reg_max :]

    # anchor grids derive from the ACTUAL feature-map shapes, so non-square
    # (rect-batched) inputs work unchanged; imgsz is kept for API compat
    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = make_anchors(feat_shapes, list(strides))  # grid units

    # decode predicted boxes in grid units, then pixels for the assigner
    dist = dfl_expectation(pred_dist, reg_max)
    pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # grid units
    pred_bboxes_px = pred_bboxes * stride_t[None]
    anc_px = anchor_points * stride_t

    pd_scores = jax.nn.sigmoid(pred_logits)
    assign = task_aligned_assign(
        jax.lax.stop_gradient(pd_scores),
        jax.lax.stop_gradient(pred_bboxes_px),
        anc_px,
        gt_labels,
        gt_bboxes,
        mask_gt,
        topk=topk,
        num_classes=nc,
    )
    target_scores = assign["target_scores"]
    fg = assign["fg_mask"]
    target_bboxes_px = assign["target_bboxes"]

    score_sum = jnp.maximum(target_scores.sum(), 1.0)

    # classification BCE over all anchors
    cls_loss = (
        optax.sigmoid_binary_cross_entropy(pred_logits, target_scores).sum()
        / score_sum
    )

    # box + dfl on foreground
    weight = target_scores.sum(-1) * fg  # (B, A)
    iou = bbox_iou(pred_bboxes_px, target_bboxes_px, ciou=True)  # (B, A)
    box_loss = ((1.0 - iou) * weight).sum() / score_sum

    target_dist = bbox2dist(
        target_bboxes_px / stride_t[None], anchor_points[None], reg_max
    )  # (B, A, 4) grid units
    dfl = _dfl_loss(
        pred_dist.reshape(-1, 4, reg_max),
        target_dist.reshape(-1, 4),
        reg_max=reg_max,
    ).reshape(B, -1)
    dfl_loss = (dfl * weight).sum() / score_sum

    total = box_w * box_loss + cls_w * cls_loss + dfl_w * dfl_loss
    metrics = {
        "box_loss": box_loss,
        "cls_loss": cls_loss,
        "dfl_loss": dfl_loss,
        "num_fg": fg.sum().astype(jnp.float32) / B,
    }
    if return_assign:
        # expose the assignment for composite losses (segmentation/pose):
        # they pair per-anchor predictions with matched GT instances
        return total, metrics, {**assign, "score_sum": score_sum}
    return total, metrics


def e2e_detection_loss(
    feats: dict,
    gt_labels: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
    nc: int,
    imgsz: int,
    strides: tuple[int, ...],
    box_w: float = 7.5,
    cls_w: float = 0.5,
    dfl_w: float = 1.5,
    reg_max: int = REG_MAX,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """v10 dual-head loss (reference ``E2EDetectLoss``, ``utils/loss.py``):
    one2many branch with TAL top-10 + one2one branch with top-1, summed.
    The one2one head saw stop-gradient features, so only its own params
    train from the second term — matching the reference's detach."""
    t_m, m_m = detection_loss(
        feats["one2many"], gt_labels, gt_bboxes, mask_gt,
        nc=nc, imgsz=imgsz, strides=strides,
        box_w=box_w, cls_w=cls_w, dfl_w=dfl_w, topk=10, reg_max=reg_max,
    )
    t_o, m_o = detection_loss(
        feats["one2one"], gt_labels, gt_bboxes, mask_gt,
        nc=nc, imgsz=imgsz, strides=strides,
        box_w=box_w, cls_w=cls_w, dfl_w=dfl_w, topk=1, reg_max=reg_max,
    )
    metrics = {k: m_m[k] + m_o[k] for k in m_m}
    return t_m + t_o, metrics
