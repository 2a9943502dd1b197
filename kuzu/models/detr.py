"""DETR-style set-prediction detector (the RF-DETR alternative family).

Capability parity with the reference's alternative detector path
(``scripts/train_character_detection_rfdetr.py`` — trains the external
``rfdetr`` package from a size registry): a self-contained
detection-transformer: conv pyramid backbone -> transformer encoder over
flattened features (2D sin-cos positions) -> decoder with learned object
queries -> per-query class logits (+ no-object) and sigmoid cxcywh boxes.

Training uses true bipartite (Hungarian) matching: the cost matrix is built
in-graph and `scipy.optimize.linear_sum_assignment` runs through
``jax.pure_callback`` (a host sync per step — acceptable for this research
family; the production detector remains the TAL-assigned YOLOv12).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from kuzu.models.layers import DecoderBlock, EncoderBlock, sincos_2d_pos_embed
from kuzu.models.unet_transformer import ConvGN
from kuzu.ops.boxes import bbox_iou, xywh2xyxy

SIZE_REGISTRY: dict[str, dict] = {  # rfdetr-style nano->large registry
    "nano": dict(dim=128, enc_depth=2, dec_depth=2, heads=4, queries=50),
    "small": dict(dim=192, enc_depth=3, dec_depth=3, heads=6, queries=100),
    "base": dict(dim=256, enc_depth=4, dec_depth=4, heads=8, queries=100),
    "large": dict(dim=384, enc_depth=6, dec_depth=6, heads=8, queries=300),
}


class DETR(nn.Module):
    num_classes: int  # real classes; index num_classes = no-object
    dim: int = 128
    enc_depth: int = 2
    dec_depth: int = 2
    heads: int = 4
    queries: int = 50
    downsamples: int = 4  # backbone stride 2^downsamples
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> dict[str, jnp.ndarray]:
        x = images
        ch = 32
        for i in range(self.downsamples):
            x = ConvGN(min(ch, self.dim), kernel=3, stride=2,
                       dtype=self.dtype, name=f"down{i}")(x)
            ch *= 2
        b, h, w, _ = x.shape
        tokens = nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            x.reshape(b, h * w, -1)
        )
        tokens = tokens + jnp.asarray(
            sincos_2d_pos_embed(self.dim, h, w), tokens.dtype
        )[None]
        for i in range(self.enc_depth):
            tokens = EncoderBlock(self.heads, dtype=self.dtype, name=f"enc{i}")(
                tokens, deterministic=not train
            )
        q = self.param(
            "query_embed", nn.initializers.normal(0.02), (self.queries, self.dim)
        )
        qx = jnp.tile(q[None], (b, 1, 1)).astype(tokens.dtype)
        for i in range(self.dec_depth):
            qx = DecoderBlock(self.heads, dtype=self.dtype, name=f"dec{i}")(
                qx, tokens, deterministic=not train
            )
        qx = nn.LayerNorm(dtype=self.dtype, name="norm")(qx)
        logits = nn.Dense(self.num_classes + 1, dtype=jnp.float32, name="cls")(qx)
        boxes = nn.sigmoid(
            nn.Dense(4, dtype=jnp.float32, name="box")(qx)
        )  # normalized cxcywh
        return {"logits": logits, "boxes": boxes}


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    """(B, Q, M) cost -> (B, M) query index assigned to each GT slot."""
    from scipy.optimize import linear_sum_assignment

    b, q, m = cost.shape
    out = np.zeros((b, m), np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        for r, c in zip(rows, cols):
            out[i, c] = r
    return out


@partial(jax.jit, static_argnames=("num_classes",))
def detr_loss(
    outputs: dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,  # (B, M, 4) normalized xyxy
    gt_labels: jnp.ndarray,  # (B, M)
    mask_gt: jnp.ndarray,  # (B, M) bool
    num_classes: int,
    cls_w: float = 1.0,
    l1_w: float = 5.0,
    giou_w: float = 2.0,
    noobj_w: float = 0.1,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    logits, pred_boxes = outputs["logits"], outputs["boxes"]  # (B,Q,C+1),(B,Q,4)
    B, Q, _ = logits.shape
    M = gt_boxes.shape[1]
    pred_xyxy = xywh2xyxy(pred_boxes)
    probs = jax.nn.softmax(logits, axis=-1)

    gt_cxcywh = jnp.concatenate(
        [(gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2, gt_boxes[..., 2:] - gt_boxes[..., :2]],
        axis=-1,
    )
    # cost matrix (B, Q, M)
    cls_idx = jnp.clip(gt_labels, 0, num_classes - 1)
    cost_cls = -jnp.take_along_axis(
        probs[:, :, None, :], cls_idx[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]
    cost_l1 = jnp.abs(pred_boxes[:, :, None, :] - gt_cxcywh[:, None, :, :]).sum(-1)
    giou = bbox_iou(pred_xyxy[:, :, None, :], gt_boxes[:, None, :, :], giou=True)
    cost = cls_w * cost_cls + l1_w * cost_l1 + giou_w * (-giou)
    # padded GT slots get a flat cost so the assignment is arbitrary but valid
    cost = jnp.where(mask_gt[:, None, :], cost, 1e4)

    assign = jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        jax.lax.stop_gradient(cost),
        vmap_method="sequential",
    )  # (B, M) query index per GT

    # classification targets: no-object everywhere, matched -> gt class
    targets = jnp.full((B, Q), num_classes, jnp.int32)
    upd = jnp.where(mask_gt, cls_idx, num_classes).astype(jnp.int32)
    targets = jax.vmap(lambda t, a, u: t.at[a].set(u))(targets, assign, upd)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    weights = jnp.where(targets == num_classes, noobj_w, 1.0)
    cls_loss = (ce * weights).sum() / weights.sum()

    matched_pred = jax.vmap(lambda p, a: p[a])(pred_boxes, assign)  # (B, M, 4)
    matched_xyxy = jax.vmap(lambda p, a: p[a])(pred_xyxy, assign)
    n_gt = jnp.maximum(mask_gt.sum(), 1)
    l1 = (jnp.abs(matched_pred - gt_cxcywh).sum(-1) * mask_gt).sum() / n_gt
    giou_m = bbox_iou(matched_xyxy, gt_boxes, giou=True)
    giou_loss = ((1.0 - giou_m) * mask_gt).sum() / n_gt

    total = cls_w * cls_loss + l1_w * l1 + giou_w * giou_loss
    return total, {
        "cls_loss": cls_loss,
        "l1_loss": l1,
        "giou_loss": giou_loss,
    }


def detr_postprocess(
    outputs: dict[str, jnp.ndarray], conf: float = 0.5, image_size: int = 1
) -> dict[str, jnp.ndarray]:
    """Per-query max-prob class (excluding no-object); no NMS needed."""
    probs = jax.nn.softmax(outputs["logits"], axis=-1)[..., :-1]
    scores = probs.max(-1)
    classes = probs.argmax(-1)
    boxes = xywh2xyxy(outputs["boxes"]) * image_size
    return {
        "boxes": boxes,
        "scores": scores,
        "classes": classes,
        "valid": scores > conf,
    }
