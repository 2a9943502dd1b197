"""Instance-segmentation loss: v8 detect loss + prototype-mask BCE.

Semantics parity with the reference ``v8SegmentationLoss``
(``yolov12/ultralytics/utils/loss.py:263-443``): the detect components are
identical; the mask term composes per-anchor masks from predicted
coefficients and shared prototypes (``pred = coeffs @ protos``), takes
binary cross-entropy against the matched GT instance mask, crops the loss
to the target box, normalizes by the normalized box area, and averages over
foreground anchors.

TPU-first differences from the torch text:
- the reference loops images and gathers the *dynamic* set of fg anchors;
  here a fixed ``max_fg`` anchors per image are selected with top-k over the
  fg mask (shape-static — XLA compiles one program). If an image has more
  than ``max_fg`` foreground anchors the excess is dropped from the mask
  term only; the ``seg_fg_dropped`` metric reports the clipped fraction (no
  silent cap).
- GT masks arrive as ONE overlap-index map per image ((B, Hm, Wm) int32,
  0 = background, i+1 = instance i — the reference's ``overlap_mask=True``
  representation), so the dataset never materializes (B, M, H, W).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from kuzu.ops.detect_loss import detection_loss


def crop_loss_to_box(
    loss: jnp.ndarray,  # (..., H, W)
    boxes: jnp.ndarray,  # (..., 4) xyxy in mask pixels
) -> jnp.ndarray:
    """Zero the per-pixel loss outside the target box (reference
    ``utils/ops.py:644`` crop_mask)."""
    h, w = loss.shape[-2], loss.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]  # (H, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, W)
    x1 = boxes[..., 0][..., None, None]
    y1 = boxes[..., 1][..., None, None]
    x2 = boxes[..., 2][..., None, None]
    y2 = boxes[..., 3][..., None, None]
    inside = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    return loss * inside


def segmentation_loss(
    outputs: dict,  # {"det": [...], "coeffs": (B, A, nm), "protos": (B, Hp, Wp, nm)}
    gt_labels: jnp.ndarray,  # (B, M)
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels
    gt_masks: jnp.ndarray,  # (B, Hm, Wm) int32 overlap-index map
    mask_gt: jnp.ndarray,  # (B, M) bool
    nc: int,
    imgsz: int,
    strides: tuple[int, ...] | Sequence[int],
    box_w: float = 7.5,
    cls_w: float = 0.5,
    dfl_w: float = 1.5,
    max_fg: int = 128,
    reg_max: int = 16,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    feats = outputs["det"]
    coeffs = outputs["coeffs"].astype(jnp.float32)
    protos = outputs["protos"].astype(jnp.float32)
    B, A, nm = coeffs.shape
    Hp, Wp = protos.shape[1], protos.shape[2]

    det_total, metrics, assign = detection_loss(
        feats, gt_labels, gt_bboxes, mask_gt, nc=nc, imgsz=imgsz,
        strides=tuple(strides), box_w=box_w, cls_w=cls_w, dfl_w=dfl_w,
        reg_max=reg_max,
        return_assign=True,
    )
    fg = assign["fg_mask"].astype(jnp.float32)  # (B, A)
    tgt_idx = assign["target_gt_idx"]  # (B, A)
    tgt_boxes = assign["target_bboxes"]  # (B, A, 4) px

    # fixed-size fg selection (see module docstring)
    k = min(max_fg, A)
    sel_fg, sel_idx = jax.lax.top_k(fg, k)  # (B, K)
    take = lambda t: jnp.take_along_axis(
        t, sel_idx.reshape(B, k, *([1] * (t.ndim - 2))), axis=1
    )
    sel_coeff = take(coeffs)  # (B, K, nm)
    sel_gt = jnp.take_along_axis(tgt_idx, sel_idx, axis=1)  # (B, K)
    sel_box = take(tgt_boxes)  # (B, K, 4)

    # predicted masks: (B, K, Hp, Wp)
    pred = jnp.einsum(
        "bkn,bhwn->bkhw", sel_coeff, protos, preferred_element_type=jnp.float32
    )

    # GT instance masks from the overlap-index map, downsampled to protos
    if gt_masks.shape[1] != Hp or gt_masks.shape[2] != Wp:
        ry = gt_masks.shape[1] // Hp
        rx = gt_masks.shape[2] // Wp
        gt_small = gt_masks[:, ::ry, ::rx][:, :Hp, :Wp]  # nearest
    else:
        gt_small = gt_masks
    gt = (
        gt_small[:, None] == (sel_gt[..., None, None] + 1)
    ).astype(jnp.float32)  # (B, K, Hp, Wp)

    bce = optax.sigmoid_binary_cross_entropy(pred, gt)  # (B, K, Hp, Wp)

    # crop to target boxes in mask coordinates; normalize by box area
    norm_box = sel_box / imgsz  # [0, 1]
    mask_box = norm_box * jnp.asarray([Wp, Hp, Wp, Hp], jnp.float32)
    area = jnp.clip(
        (norm_box[..., 2] - norm_box[..., 0])
        * (norm_box[..., 3] - norm_box[..., 1]),
        1e-4,
    )
    per_anchor = crop_loss_to_box(bce, mask_box).mean((-2, -1)) / area  # (B, K)

    n_fg = jnp.maximum(fg.sum(), 1.0)
    seg = (per_anchor * sel_fg).sum() / n_fg

    dropped = jnp.maximum(fg.sum() - sel_fg.sum(), 0.0) / n_fg
    total = det_total + box_w * seg
    metrics = dict(metrics)
    metrics["seg_loss"] = seg
    metrics["seg_fg_dropped"] = dropped
    return total, metrics
