"""Anchor-free grid utilities for the detection head.

Parity with the reference's ``make_anchors`` / ``dist2bbox`` / ``bbox2dist``
(``yolov12/ultralytics/utils/tal.py:333-365``): anchor points are grid-cell
centers per feature level; boxes are decoded from (left, top, right, bottom)
distances. Static shapes throughout.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_anchors(
    feat_shapes: list[tuple[int, int]],
    strides: list[int],
    grid_cell_offset: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build anchor centers and per-anchor strides.

    Args:
      feat_shapes: [(h, w)] per detection level.
      strides: stride per level.

    Returns:
      anchor_points (A, 2) in feature-grid units, stride_tensor (A, 1).
    """
    points, stride_out = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        stride_out.append(jnp.full((h * w, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(points, axis=0), jnp.concatenate(stride_out, axis=0)


def dist2bbox(
    distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True
) -> jnp.ndarray:
    """(l, t, r, b) distances + anchor centers -> boxes. (..., A, 4)."""
    lt, rb = distance[..., :2], distance[..., 2:4]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(
    bbox: jnp.ndarray, anchor_points: jnp.ndarray, reg_max: float
) -> jnp.ndarray:
    """xyxy boxes -> clamped (l, t, r, b) distances for DFL targets."""
    x1y1, x2y2 = bbox[..., :2], bbox[..., 2:4]
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0, reg_max - 0.01)
