"""Task-aligned assigner (TAL) — static-shape JAX implementation.

Semantics parity with the reference ``TaskAlignedAssigner``
(``yolov12/ultralytics/utils/tal.py:14-297``): align metric
``score^alpha * CIoU^beta`` (alpha=0.5, beta=6), top-k (10) candidates per GT
restricted to anchors whose center lies inside the GT box, multi-GT conflicts
resolved by highest IoU, and target scores normalized per GT by
``max_overlap / max_align``. All ragged structures are padded: GT boxes come
in as (B, M, 4) with a validity mask, outputs are dense (B, A, ...) arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kuzu.ops.boxes import bbox_iou

EPS = 1e-9


def anchors_in_gts(
    anc_points: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9
) -> jnp.ndarray:
    """(A, 2) x (B, M, 4) -> (B, M, A) bool: anchor center inside GT box."""
    x, y = anc_points[:, 0], anc_points[:, 1]
    x1, y1, x2, y2 = (gt_bboxes[..., i : i + 1] for i in range(4))  # (B, M, 1)
    return (
        (x[None, None] - x1 > eps)
        & (y[None, None] - y1 > eps)
        & (x2 - x[None, None] > eps)
        & (y2 - y[None, None] > eps)
    )


@partial(jax.jit, static_argnames=("topk", "num_classes"))
def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid probabilities
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy pixels
    anc_points: jnp.ndarray,  # (A, 2) pixels
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels (0 rows for padding)
    mask_gt: jnp.ndarray,  # (B, M) bool
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
) -> dict[str, jnp.ndarray]:
    B, A, nc = pd_scores.shape
    M = gt_labels.shape[1]

    in_gts = anchors_in_gts(anc_points, gt_bboxes)  # (B, M, A)
    valid = in_gts & mask_gt[..., None]

    # CIoU(gt, pred) per pair
    overlaps = bbox_iou(
        gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], ciou=True
    )
    overlaps = jnp.clip(jnp.squeeze(overlaps, -1) if overlaps.ndim == 4 else overlaps, 0.0, None)
    # scores of each anchor at the GT's class
    cls_idx = jnp.clip(gt_labels, 0, nc - 1)  # (B, M)
    bbox_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1),  # (B, nc, A)
        cls_idx[:, :, None],
        axis=1,
    )  # (B, M, A)
    align = (bbox_scores**alpha) * (overlaps**beta)
    align = jnp.where(valid, align, 0.0)

    # top-k anchors per GT by align metric. NOTE: no per-anchor metric
    # threshold — the reference keeps top-k in-GT candidates even when the
    # align metric is ~0 (cold-start: initial boxes barely overlap GTs and
    # assignment must still bootstrap); out-of-GT zeros are removed by
    # ``valid`` below.
    k = min(topk, A)
    _, top_idx = jax.lax.top_k(align, k)  # (B, M, k)
    oh = jax.nn.one_hot(top_idx, A, dtype=jnp.bool_)  # (B, M, k, A)
    topk_mask = oh.any(axis=2)

    mask_pos = topk_mask & valid  # (B, M, A)

    # conflict resolution: anchor claimed by multiple GTs -> keep max overlap
    claims = mask_pos.sum(axis=1)  # (B, A)
    masked_overlaps = jnp.where(mask_pos, overlaps, -1.0)
    best_gt = masked_overlaps.argmax(axis=1)  # (B, A)
    one_best = jax.nn.one_hot(best_gt, M, dtype=jnp.bool_).transpose(0, 2, 1)
    mask_pos = jnp.where((claims > 1)[:, None, :], one_best & mask_pos, mask_pos)

    fg_mask = mask_pos.any(axis=1)  # (B, A)
    target_gt_idx = jnp.where(mask_pos, jnp.arange(M)[None, :, None], 0).max(axis=1)

    # gather targets
    target_labels = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)  # (B, A)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1
    )  # (B, A, 4)

    # normalized target scores
    align_pos = jnp.where(mask_pos, align, 0.0)
    pos_align = align_pos.max(axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlap = jnp.where(mask_pos, overlaps, 0.0).max(axis=-1, keepdims=True)
    norm = (align_pos * pos_overlap / (pos_align + EPS)).max(axis=1)  # (B, A)

    target_scores = jax.nn.one_hot(
        jnp.clip(target_labels, 0, nc - 1), nc, dtype=pd_scores.dtype
    )
    target_scores = target_scores * (norm * fg_mask)[..., None]

    return {
        "target_labels": jnp.where(fg_mask, target_labels, nc),
        "target_bboxes": target_bboxes,
        "target_scores": target_scores,
        "fg_mask": fg_mask,
        "target_gt_idx": target_gt_idx,
    }
