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


@partial(jax.jit, static_argnames=("topk", "num_classes", "rotated"))
def task_aligned_assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoid probabilities
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy px — or (B, A, 5) xywhr rotated
    anc_points: jnp.ndarray,  # (A, 2) pixels
    gt_labels: jnp.ndarray,  # (B, M) int32
    gt_bboxes: jnp.ndarray,  # (B, M, 4|5) pixels (0 rows for padding)
    mask_gt: jnp.ndarray,  # (B, M) bool
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    rotated: bool = False,
) -> dict[str, jnp.ndarray]:
    """``rotated=True`` switches to the reference
    ``RotatedTaskAlignedAssigner`` (``tal.py:298``): probIoU overlaps and
    a point-in-rotated-box candidate gate; boxes are (..., 5) xywhr."""
    B, A, nc = pd_scores.shape
    M = gt_labels.shape[1]

    if rotated:
        from kuzu.ops.obb import anchors_in_rboxes, probiou

        in_gts = anchors_in_rboxes(anc_points, gt_bboxes)
        overlaps = jnp.clip(
            probiou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]), 0.0
        )
    else:
        in_gts = anchors_in_gts(anc_points, gt_bboxes)  # (B, M, A)
        # CIoU(gt, pred) per pair
        overlaps = bbox_iou(
            gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], ciou=True
        )
        overlaps = jnp.clip(
            jnp.squeeze(overlaps, -1) if overlaps.ndim == 4 else overlaps,
            0.0,
            None,
        )
    valid = in_gts & mask_gt[..., None]
    # scores of each anchor at the GT's class
    cls_idx = jnp.clip(gt_labels, 0, nc - 1)  # (B, M)
    bbox_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1),  # (B, nc, A)
        cls_idx[:, :, None],
        axis=1,
    )  # (B, M, A)
    align = (bbox_scores**alpha) * (overlaps**beta)
    align = jnp.where(valid, align, 0.0)
    # materialize once: the CIoU->pow chain feeds the k-iteration top-k loop
    # and three later consumers — without a barrier XLA fusion re-derives it
    # per consumer (measured: the whole assigner at 61 ms vs ~15 ms with the
    # chain pinned, B=8 M=300 A=34k)
    overlaps, align = jax.lax.optimization_barrier((overlaps, align))

    # top-k anchors per GT by align metric. NOTE: no per-anchor metric
    # threshold — the reference keeps top-k in-GT candidates even when the
    # align metric is ~0 (cold-start: initial boxes barely overlap GTs and
    # assignment must still bootstrap); out-of-GT zeros are removed by
    # ``valid`` below.
    k = min(topk, A)
    # Exact top-k via k iterative argmax passes: with k=10 and A=34k this
    # avoids lax.top_k's full sort over A AND the (B, M, k, A) one-hot —
    # which at flagship scale (B=8, M=300, A=34000) materialized 816M
    # elements and made the assigner half the train step (PERFORMANCE.md).
    # Tie order (first index wins) matches lax.top_k / torch.topk.
    topk_mask = jnp.zeros(align.shape, jnp.bool_)
    work = align
    neg = jnp.float32(-1.0)  # align >= 0 everywhere
    for _ in range(k):
        idx = work.argmax(axis=-1)  # (B, M)
        sel = (
            jnp.arange(A, dtype=jnp.int32)[None, None] == idx[..., None]
        )
        topk_mask = topk_mask | sel
        work = jnp.where(sel, neg, work)

    mask_pos = topk_mask & valid  # (B, M, A)

    # conflict resolution: anchor claimed by multiple GTs -> keep max overlap
    claims = mask_pos.sum(axis=1)  # (B, A)
    masked_overlaps = jnp.where(mask_pos, overlaps, -1.0)
    best_gt = masked_overlaps.argmax(axis=1)  # (B, A)
    # direct broadcast compare instead of one_hot(B,A,M)+transpose — the
    # transpose of an 80M-element tensor was a measurable assigner cost
    one_best = best_gt[:, None, :] == jnp.arange(M, dtype=best_gt.dtype)[None, :, None]
    mask_pos = jnp.where((claims > 1)[:, None, :], one_best & mask_pos, mask_pos)
    mask_pos = jax.lax.optimization_barrier(mask_pos)  # 6 consumers below

    fg_mask = mask_pos.any(axis=1)  # (B, A)
    # exactly one claiming GT after conflict resolution -> argmax == the
    # claiming row (0 for background, matching the masked ``where().max``)
    target_gt_idx = mask_pos.argmax(axis=1)  # (B, A)

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
