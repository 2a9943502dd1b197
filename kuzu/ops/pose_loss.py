"""Keypoint (pose) loss: v8 detect loss + OKS location + visibility BCE.

Semantics parity with the reference ``v8PoseLoss`` / ``KeypointLoss``
(``yolov12/ultralytics/utils/loss.py:140-155, 446-600``): per-foreground
anchor, predicted keypoints (decoded anchor-relative, grid units) compare
to the matched GT instance's keypoints via the COCO-eval OKS Gaussian
``1 - exp(-d² / (2σ)² / (2·area))`` masked by visibility, plus BCE on the
visibility logit.

TPU-first: GT keypoints arrive padded (B, M, K, D); the per-anchor gather
runs over the FULL anchor set with ``target_gt_idx`` (no dynamic fg
selection — (B, A, K, 3) is only a few MB), and the fg mask weights the
reduction.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax

from kuzu.models.yolo.modules import kpts_decode
from kuzu.ops.anchors import make_anchors
from kuzu.ops.detect_loss import detection_loss

# COCO-17 OKS sigmas (public COCO keypoint-eval constants)
OKS_SIGMA_17 = jnp.asarray(
    [
        0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62,
        1.07, 1.07, 0.87, 0.87, 0.89, 0.89,
    ]
) / 10.0


def pose_loss(
    outputs: dict,  # {"det": [...], "kpts_raw": (B, A, K, D)}
    gt_labels: jnp.ndarray,  # (B, M)
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy px
    gt_kpts: jnp.ndarray,  # (B, M, K, D) px coords (+ visibility)
    mask_gt: jnp.ndarray,  # (B, M) bool
    nc: int,
    imgsz: int,
    strides: tuple[int, ...] | Sequence[int],
    box_w: float = 7.5,
    cls_w: float = 0.5,
    dfl_w: float = 1.5,
    pose_w: float = 12.0,
    kobj_w: float = 1.0,
    reg_max: int = 16,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    feats = outputs["det"]
    raw = outputs["kpts_raw"].astype(jnp.float32)  # (B, A, K, D)
    B, A, K, D = raw.shape

    det_total, metrics, assign = detection_loss(
        feats, gt_labels, gt_bboxes, mask_gt, nc=nc, imgsz=imgsz,
        strides=tuple(strides), box_w=box_w, cls_w=cls_w, dfl_w=dfl_w,
        reg_max=reg_max,
        return_assign=True,
    )
    fg = assign["fg_mask"].astype(jnp.float32)  # (B, A)
    tgt_idx = assign["target_gt_idx"]  # (B, A)
    tgt_boxes = assign["target_bboxes"]  # (B, A, 4) px

    feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchor_points, stride_t = make_anchors(feat_shapes, list(strides))
    pred = kpts_decode(anchor_points, raw)  # grid units (+ vis logits)

    # matched GT keypoints per anchor, scaled into each anchor's grid units
    sel = jnp.take_along_axis(
        gt_kpts.astype(jnp.float32), tgt_idx[..., None, None], axis=1
    )  # (B, A, K, D)
    sel_xy = sel[..., :2] / stride_t[None, :, None, :]
    vis = sel[..., 2] != 0 if D == 3 else jnp.ones(sel.shape[:-1], bool)
    vis = vis.astype(jnp.float32)

    # OKS Gaussian (cocoeval form), area from the matched box in grid units
    wh = (tgt_boxes[..., 2:] - tgt_boxes[..., :2]) / stride_t[None]
    area = jnp.clip(wh[..., 0] * wh[..., 1], 1e-9)  # (B, A)
    sig = OKS_SIGMA_17 if K == 17 else jnp.full((K,), 1.0 / K)
    d2 = ((pred[..., :2] - sel_xy) ** 2).sum(-1)  # (B, A, K)
    e = d2 / ((2 * sig[None, None]) ** 2 * (area[..., None] + 1e-9) * 2)
    factor = K / jnp.maximum(vis.sum(-1, keepdims=True), 1e-9)  # (B, A, 1)
    per_anchor = (factor * (1 - jnp.exp(-e)) * vis).mean(-1)  # (B, A)
    n_fg = jnp.maximum(fg.sum(), 1.0)
    kpt_loss = (per_anchor * fg).sum() / n_fg

    if D == 3:
        kobj = optax.sigmoid_binary_cross_entropy(pred[..., 2], vis).mean(-1)
        kobj_loss = (kobj * fg).sum() / n_fg
    else:
        kobj_loss = jnp.zeros(())

    total = det_total + pose_w * kpt_loss + kobj_w * kobj_loss
    metrics = dict(metrics)
    metrics["kpt_loss"] = kpt_loss
    metrics["kobj_loss"] = kobj_loss
    return total, metrics
