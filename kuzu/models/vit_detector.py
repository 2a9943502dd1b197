"""ViT patch-head character detector (legacy model family).

Capability parity with the reference ``CharacterDetectionModel``
(``src/models/character_detection/model.py:7``): a ViT backbone whose
per-patch features feed a detection head (x1y1x2y2 + confidence, sigmoid
normalized) and a classification head; the loss uses IoU-based assignment
with a **dynamic IoU-threshold schedule** (``:143-149``), focal confidence
loss (``:187-204``) and GIoU regression (``:213``); inference uses the
shared padded NMS. Layer freezing (first k blocks, ``:39-44``) is expressed
as an optax ``zero_grads`` mask helper.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from kuzu.models.layers import EncoderBlock, PatchEmbed, sincos_2d_pos_embed
from kuzu.ops.boxes import bbox_iou, box_iou_matrix


class ViTPatchDetector(nn.Module):
    num_classes: int
    image_size: tuple[int, int] = (1024, 64)
    patch_size: tuple[int, int] = (16, 16)
    dim: int = 256
    depth: int = 8
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> dict[str, jnp.ndarray]:
        """-> {'boxes' (B, P, 4) normalized xyxy, 'conf' (B, P), 'cls' (B, P, nc)}."""
        from kuzu.ops.images import from_uint8

        images = from_uint8(images)
        gh = self.image_size[0] // self.patch_size[0]
        gw = self.image_size[1] // self.patch_size[1]
        x = PatchEmbed(self.dim, self.patch_size, dtype=self.dtype)(images)
        x = x + jnp.asarray(sincos_2d_pos_embed(self.dim, gh, gw), x.dtype)[None]
        for i in range(self.depth):
            x = EncoderBlock(self.num_heads, dtype=self.dtype, name=f"block{i}")(
                x, deterministic=not train
            )
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        det = nn.Dense(5, dtype=jnp.float32, name="det_head")(x)  # x1y1x2y2+conf
        cls = nn.Dense(self.num_classes, dtype=jnp.float32, name="cls_head")(x)
        boxes = jax.nn.sigmoid(det[..., :4])
        # enforce x2>x1, y2>y1 by sorting the pairs
        x1 = jnp.minimum(boxes[..., 0], boxes[..., 2])
        x2 = jnp.maximum(boxes[..., 0], boxes[..., 2])
        y1 = jnp.minimum(boxes[..., 1], boxes[..., 3])
        y2 = jnp.maximum(boxes[..., 1], boxes[..., 3])
        return {
            "boxes": jnp.stack([x1, y1, x2, y2], axis=-1),
            "conf": det[..., 4],
            "cls": cls,
        }


def dynamic_iou_threshold(
    epoch: jnp.ndarray, start: float = 0.3, end: float = 0.5, ramp_epochs: int = 20
) -> jnp.ndarray:
    """Reference schedule: assignment IoU threshold ramps up over training."""
    frac = jnp.clip(epoch / ramp_epochs, 0.0, 1.0)
    return start + (end - start) * frac


def focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0
) -> jnp.ndarray:
    """Elementwise focal BCE (reference focal conf loss)."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


@partial(jax.jit, static_argnames=("num_classes",))
def vit_detector_loss(
    outputs: dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,  # (B, M, 4) normalized xyxy
    gt_labels: jnp.ndarray,  # (B, M)
    mask_gt: jnp.ndarray,  # (B, M) bool
    iou_threshold: jnp.ndarray,  # scalar (dynamic schedule)
    num_classes: int,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """IoU-assignment loss: each GT matches its best patch above threshold;
    focal conf on all patches, GIoU + CE on matched ones."""

    def per_image(pred_boxes, conf, cls_logits, gts, labels, mask):
        iou = box_iou_matrix(gts, pred_boxes)  # (M, P)
        iou = jnp.where(mask[:, None], iou, -1.0)
        best_patch = iou.argmax(axis=1)  # (M,)
        best_iou = iou.max(axis=1)
        matched = mask & (best_iou > iou_threshold)
        # conf targets: 1 at matched patches
        p = pred_boxes.shape[0]
        conf_t = jnp.zeros((p,))
        conf_t = conf_t.at[best_patch].max(matched.astype(jnp.float32))
        conf_loss = focal_loss(conf, conf_t).mean()
        # box + cls on matched GTs
        mb = pred_boxes[best_patch]  # (M, 4)
        giou = bbox_iou(mb, gts, giou=True)
        w = matched.astype(jnp.float32)
        box_loss = ((1.0 - giou) * w).sum() / jnp.maximum(w.sum(), 1.0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            cls_logits[best_patch], jnp.clip(labels, 0, num_classes - 1)
        )
        cls_loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
        return conf_loss, box_loss, cls_loss, w.sum()

    conf_l, box_l, cls_l, n_match = jax.vmap(per_image)(
        outputs["boxes"], outputs["conf"], outputs["cls"],
        gt_boxes, gt_labels, mask_gt,
    )
    loss = conf_l.mean() + 2.0 * box_l.mean() + cls_l.mean()
    return loss, {
        "conf_loss": conf_l.mean(),
        "box_loss": box_l.mean(),
        "cls_loss": cls_l.mean(),
        "n_matched": n_match.mean(),
    }


def freeze_mask(params: Any, frozen_blocks: int) -> Any:
    """optax mask: True = trainable. Freezes the first k encoder blocks
    (reference freezes the first 6 ViT layers)."""
    frozen_names = {f"block{i}" for i in range(frozen_blocks)}

    def walk(tree, frozen):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", None) in frozen_names for p in path
            ),
            tree,
        )

    return walk(params, frozen_names)
