"""Pallas TPU kernel for greedy NMS suppression.

Replaces the O(K)-step sequential `lax.scan` in ``kuzu.ops.nms._suppress``
(itself the rebuild of torchvision's C++/CUDA NMS kernel, reference
``yolov12/ultralytics/utils/ops.py:296``) with a single TPU kernel.

Layout: each coordinate plane is reshaped to (K/128, 128) so every kernel op
is a full (sublane, lane) vreg op — Mosaic cannot do dynamic unaligned
scalar loads from the lane dimension, so the greedy pass extracts the pivot
box via masked reductions instead:

    pivot_x1 = sum(where(flat_index == g, x1_tiles, 0))

Per row that is ~20 full-width VPU ops; 2048 rows stream through VMEM with
no per-step XLA loop overhead and no (K, K) IoU matrix in HBM (the scan
reference materializes K^2 floats). Grid = batch; one program per image.
Non-TPU backends run the same kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _nms_kernel(
    x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, sup_ref,
    *, iou_threshold: float,
):
    """Refs (B, S, L) f32 with S*L = K; grid over B. sup: (S, L) scratch."""
    b = pl.program_id(0)
    s, l = x1_ref.shape[1], x1_ref.shape[2]
    k = s * l
    x1 = x1_ref[b]  # (S, L)
    y1 = y1_ref[b]
    x2 = x2_ref[b]
    y2 = y2_ref[b]
    valid = valid_ref[b]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (s, l), 0) * l
        + jax.lax.broadcasted_iota(jnp.int32, (s, l), 1)
    )
    sup_ref[:] = jnp.zeros((s, l), jnp.float32)

    def row_body(g, _):
        pivot = jnp.where(idx == g, 1.0, 0.0)

        def pick(t):
            return jnp.sum(t * pivot)

        px1, py1, px2, py2 = pick(x1), pick(y1), pick(x2), pick(y2)
        parea = jnp.maximum(px2 - px1, 0.0) * jnp.maximum(py2 - py1, 0.0)
        iw = jnp.maximum(jnp.minimum(px2, x2) - jnp.maximum(px1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(py2, y2) - jnp.maximum(py1, y1), 0.0)
        inter = iw * ih
        iou = inter / (parea + area - inter + 1e-7)
        kept = (pick(sup_ref[:]) == 0.0) & (pick(valid) != 0.0)
        over = jnp.where((iou > iou_threshold) & (idx > g), valid, 0.0)
        sup_ref[:] = jnp.maximum(sup_ref[:], jnp.where(kept, over, 0.0))
        return 0

    jax.lax.fori_loop(0, k, row_body, 0)
    keep_ref[b] = jnp.where(sup_ref[:] == 0.0, 1.0, 0.0) * valid


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_suppress(
    boxes: jnp.ndarray,  # (B, K, 4) f32, score-desc sorted
    valid: jnp.ndarray,  # (B, K) bool
    iou_threshold: float = 0.45,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched keep-mask via the Pallas kernel. K must be 128-aligned."""
    b, k, _ = boxes.shape
    assert k % LANES == 0, f"K={k} must be a multiple of {LANES}"
    s = k // LANES
    planes = [
        boxes[..., i].astype(jnp.float32).reshape(b, s, LANES) for i in range(4)
    ]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold),
        grid=(b,),
        in_specs=[full] * 5,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((b, s, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, LANES), jnp.float32)],
        interpret=interpret,
    )(*planes, valid.astype(jnp.float32).reshape(b, s, LANES))
    return keep.reshape(b, k).astype(bool)
