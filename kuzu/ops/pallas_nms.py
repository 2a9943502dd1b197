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


def _nms_kernel_chunked(
    x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, sup_ref, over_ref,
    *, iou_threshold: float,
):
    """Chunked greedy pass: one 128-lane row of pivots at a time.

    Same keep semantics (bit-identical: same f32 IoU expression, same
    comparisons) as ``_nms_kernel``, but the O(K) serial loop of full
    (S, L)-wide ops becomes, per row chunk:

      1. one (L, L) intra-row IoU matrix build (dense VPU work),
      2. an L-step greedy recurrence on (1, L) tiles (16x narrower than
         the unchunked loop's (S, L) steps), reading rows of the matrix
         from a VMEM scratch via dynamic sublane slices,
      3. one batched (L, S-c-1, L) cross-suppression of all kept row
         pivots against every later box (replaces L full-tile loop
         iterations); the chunk index is trace-static so the later-rows
         slice is static — triangular, ~half the masked-full-tile work.

    over_ref: (L, L) VMEM scratch holding the intra-row over-threshold
    matrix so step 2 can dynamic-slice rows.
    """
    b = pl.program_id(0)
    s, l = x1_ref.shape[1], x1_ref.shape[2]
    x1 = x1_ref[b]  # (S, L)
    y1 = y1_ref[b]
    x2 = x2_ref[b]
    y2 = y2_ref[b]
    valid = valid_ref[b]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    sup_ref[:] = jnp.zeros((s, l), jnp.float32)

    # lane->sublane "transpose" of a (1, L) row via masked reduction —
    # avoids relying on Mosaic relayout support for tiny transposes
    eq = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (l, l), 1),
        1.0,
        0.0,
    )
    def col(row):  # (1, L) -> (L, 1)
        return jnp.sum(eq * row, axis=1, keepdims=True)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1)

    for c in range(s):  # static unroll: S is small (K/128)
        rx1, ry1 = x1[c : c + 1], y1[c : c + 1]  # (1, L)
        rx2, ry2 = x2[c : c + 1], y2[c : c + 1]
        rvalid = valid[c : c + 1]
        rarea = area[c : c + 1]
        px1, py1, px2, py2 = col(rx1), col(ry1), col(rx2), col(ry2)  # (L, 1)
        parea = col(rarea)

        # intra-row over matrix: pivot i (sublane) suppresses j (lane), j > i
        iw = jnp.maximum(jnp.minimum(px2, rx2) - jnp.maximum(px1, rx1), 0.0)
        ih = jnp.maximum(jnp.minimum(py2, ry2) - jnp.maximum(py1, ry1), 0.0)
        inter = iw * ih
        iou = inter / (parea + rarea - inter + 1e-7)
        over_ref[:] = jnp.where(
            (iou > iou_threshold) & (lane_j > lane_i), rvalid, 0.0
        )

        def step(i, sup_row):
            over_i = over_ref[pl.ds(i, 1), :]  # (1, L)
            sel = lane1 == i
            kept_i = (jnp.sum(jnp.where(sel, sup_row, 0.0)) == 0.0) & (
                jnp.sum(jnp.where(sel, rvalid, 0.0)) != 0.0
            )
            return jnp.maximum(sup_row, jnp.where(kept_i, over_i, 0.0))

        sup_row = jax.lax.fori_loop(0, l, step, sup_ref[c : c + 1])
        sup_ref[c : c + 1] = sup_row

        if c < s - 1:
            kept = jnp.where((sup_row == 0.0) & (rvalid != 0.0), 1.0, 0.0)
            k3 = col(kept)[:, :, None]  # (L, 1, 1)
            qx1, qy1 = px1[:, :, None], py1[:, :, None]
            qx2, qy2 = px2[:, :, None], py2[:, :, None]
            qarea = parea[:, :, None]
            # later rows only — c is trace-static, so the slice is static.
            # (slice, THEN expand_dims: `arr[None, c+1:]` mixed indexing
            # lowers to lax.gather, which Mosaic cannot lower here)
            def later(t):  # (S, L) -> (1, S-c-1, L)
                return jnp.expand_dims(t[c + 1 :], 0)

            tx1, ty1, tx2, ty2 = later(x1), later(y1), later(x2), later(y2)
            tvalid, tarea = later(valid), later(area)
            iw3 = jnp.maximum(
                jnp.minimum(qx2, tx2) - jnp.maximum(qx1, tx1), 0.0
            )  # (L, S-c-1, L)
            ih3 = jnp.maximum(
                jnp.minimum(qy2, ty2) - jnp.maximum(qy1, ty1), 0.0
            )
            inter3 = iw3 * ih3
            iou3 = inter3 / (qarea + tarea - inter3 + 1e-7)
            hit = jnp.where(iou3 > iou_threshold, tvalid * k3, 0.0)
            sup_ref[c + 1 :] = jnp.maximum(
                sup_ref[c + 1 :], jnp.max(hit, axis=0)
            )

    keep_ref[b] = jnp.where(sup_ref[:] == 0.0, 1.0, 0.0) * valid


def _nms_kernel_batched(
    x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, sup_ref, over_ref,
    *, iou_threshold: float,
):
    """Image-batched chunked greedy pass (no grid: one program, all B).

    The grid-over-images kernels run their serial recurrence B times on
    the single TensorCore (B*K steps total). Here the L-step greedy
    recurrence for row chunk c advances ALL images at once on (B, 1, L)
    tiles — K serial steps total, an 8x cut at B=8 — while the dense
    intra-row IoU matrix is built batched as (B, L, L) and the cheap
    cross-suppression stays per-image (4D temps would blow the 16 MB
    scoped-VMEM limit). Keep semantics bit-identical to ``_nms_kernel``.

    over_ref: (B, L, L) VMEM scratch of intra-row over-threshold matrices.
    """
    b, s, l = x1_ref.shape
    x1 = x1_ref[:]  # (B, S, L)
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    valid = valid_ref[:]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    sup_ref[:] = jnp.zeros((b, s, l), jnp.float32)

    eq = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (l, l), 1),
        1.0,
        0.0,
    )

    def col3(row):  # (B, 1, L) -> (B, L, 1)
        return jnp.sum(eq[None] * row, axis=2, keepdims=True)

    # 3D iotas directly: Mosaic rejects rank-expanding reshapes of i1,
    # so (lane_j > lane_i)[None] is not an option
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, l, l), 1)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (1, l, l), 2)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, l), 2)

    for c in range(s):
        rx1, ry1 = x1[:, c : c + 1, :], y1[:, c : c + 1, :]  # (B, 1, L)
        rx2, ry2 = x2[:, c : c + 1, :], y2[:, c : c + 1, :]
        rvalid = valid[:, c : c + 1, :]
        rarea = area[:, c : c + 1, :]
        px1, py1, px2, py2 = col3(rx1), col3(ry1), col3(rx2), col3(ry2)
        parea = col3(rarea)  # (B, L, 1)

        iw = jnp.maximum(jnp.minimum(px2, rx2) - jnp.maximum(px1, rx1), 0.0)
        ih = jnp.maximum(jnp.minimum(py2, ry2) - jnp.maximum(py1, ry1), 0.0)
        inter = iw * ih  # (B, L, L)
        iou = inter / (parea + rarea - inter + 1e-7)
        over_ref[:] = jnp.where(
            (iou > iou_threshold) & (lane_j > lane_i), rvalid, 0.0
        )

        def step(i, sup_row):  # sup_row (B, 1, L)
            over_i = over_ref[:, pl.ds(i, 1), :]  # (B, 1, L)
            sel = lane3 == i
            ksum = jnp.sum(jnp.where(sel, sup_row, 0.0), axis=2, keepdims=True)
            vsum = jnp.sum(jnp.where(sel, rvalid, 0.0), axis=2, keepdims=True)
            kept = (ksum == 0.0) & (vsum != 0.0)  # (B, 1, 1)
            return jnp.maximum(sup_row, jnp.where(kept, over_i, 0.0))

        sup_row = jax.lax.fori_loop(0, l, step, sup_ref[:, c : c + 1, :])
        sup_ref[:, c : c + 1, :] = sup_row

        if c < s - 1:
            kept_rows = jnp.where(
                (sup_row == 0.0) & (rvalid != 0.0), 1.0, 0.0
            )  # (B, 1, L)
            kept_cols = col3(kept_rows)  # (B, L, 1)
            for bb in range(b):  # per-image 3D cross pass (VMEM-bounded)
                k3 = jnp.expand_dims(kept_cols[bb], 2)  # (L, 1, 1)
                qx1 = jnp.expand_dims(px1[bb], 2)
                qy1 = jnp.expand_dims(py1[bb], 2)
                qx2 = jnp.expand_dims(px2[bb], 2)
                qy2 = jnp.expand_dims(py2[bb], 2)
                qarea = jnp.expand_dims(parea[bb], 2)

                def later(t):  # (B, S, L) -> (1, S-c-1, L)
                    return jnp.expand_dims(t[bb][c + 1 :], 0)

                iw3 = jnp.maximum(
                    jnp.minimum(qx2, later(x2)) - jnp.maximum(qx1, later(x1)),
                    0.0,
                )  # (L, S-c-1, L)
                ih3 = jnp.maximum(
                    jnp.minimum(qy2, later(y2)) - jnp.maximum(qy1, later(y1)),
                    0.0,
                )
                inter3 = iw3 * ih3
                iou3 = inter3 / (qarea + later(area) - inter3 + 1e-7)
                hit = jnp.where(
                    iou3 > iou_threshold, later(valid) * k3, 0.0
                )
                sup_ref[bb, c + 1 :] = jnp.maximum(
                    sup_ref[bb, c + 1 :], jnp.max(hit, axis=0)
                )

    keep_ref[:] = jnp.where(sup_ref[:] == 0.0, 1.0, 0.0) * valid


_KERNELS = {
    "full": _nms_kernel,
    "chunked": _nms_kernel_chunked,
    "batched": _nms_kernel_batched,
}


def _select_variant(b: int, s: int) -> str:
    """Shape-gate the kernel choice (validated bounds, not preferences).

    The chunked/batched cross pass builds (L, S-c-1, L) f32 temps — 8.3 MB
    each at S=128 with several live, over the 16 MB scoped-VMEM budget —
    and unrolls S (x B for batched) static program blocks, so large S
    blows compile time/program size. Gates:

    - batched: s <= 32 and b*s <= 256 (validated B=8/S=16 on chip; at
      s=32 the largest temp is 2.0 MB)
    - chunked: s <= 64 (largest temp 4.1 MB, per-image grid)
    - full:    everything else — fori_loop over K rows, (S, L) working
      set, scales to any K (the pre-r4 production kernel)
    """
    if s <= 32 and b * s <= 256:
        return "batched"
    if s <= 64:
        return "chunked"
    return "full"


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "interpret", "variant")
)
def pallas_suppress(
    boxes: jnp.ndarray,  # (B, K, 4) f32, score-desc sorted
    valid: jnp.ndarray,  # (B, K) bool
    iou_threshold: float = 0.45,
    interpret: bool = False,
    variant: str = "auto",
) -> jnp.ndarray:
    """Batched keep-mask via the Pallas kernel. K must be 128-aligned.

    variant: "auto" (default) picks by shape via ``_select_variant`` —
    "batched" (image-batched chunked greedy, 0.65 ms vs 2.91 full / 2.74
    chunked at B=8 K=2048 on chip) when its VMEM/program-size bounds hold,
    "chunked" (grid-over-images row chunking) at mid S, else "full" (the
    original full-tile serial kernel, unbounded shapes). All three produce
    bit-identical keeps; chip timings in PERFORMANCE.md "Round-4 kernel
    work: chunked NMS". Explicit variant strings are honored unchecked.
    """
    b, k, _ = boxes.shape
    assert k % LANES == 0, f"K={k} must be a multiple of {LANES}"
    s = k // LANES
    if variant == "auto":
        variant = _select_variant(b, s)
    planes = [
        boxes[..., i].astype(jnp.float32).reshape(b, s, LANES) for i in range(4)
    ]
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _KERNELS[variant], iou_threshold=iou_threshold
    )
    if variant == "batched":
        grid = ()
        scratch = [
            pltpu.VMEM((b, s, LANES), jnp.float32),
            pltpu.VMEM((b, LANES, LANES), jnp.float32),
        ]
    else:
        grid = (b,)
        scratch = [pltpu.VMEM((s, LANES), jnp.float32)]
        if variant == "chunked":
            scratch.append(pltpu.VMEM((LANES, LANES), jnp.float32))
    keep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full] * 5,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((b, s, LANES), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*planes, valid.astype(jnp.float32).reshape(b, s, LANES))
    return keep.reshape(b, k).astype(bool)
