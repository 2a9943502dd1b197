"""Pallas TPU flash attention (online-softmax, O(N) memory).

The TPU-native replacement for the reference's flash-attn CUDA dependency
(``yolov12/ultralytics/nn/modules/block.py:1163-1243`` fast path,
``pyproject.toml:66-73``): block-wise softmax(QK^T)V with running max/sum
carried in VMEM scratch, so the N x N attention matrix never materializes in
HBM. Used for long token sequences (high-resolution area attention, ViT
encoders at large image sizes); for short sequences XLA's fused batched
matmul path in ``kuzu.models.layers.MultiHeadAttention`` is already optimal
on the MXU, so callers choose per shape (``flash_attention_auto``).

Layout: q/k/v are (BH, N, D) with heads folded into the leading grid dim;
D pads to the 128-lane width inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
NEG_INF = -1e30

# Interpret mode (running the kernels on the CPU backend) is an explicit
# argument everywhere: modules select it via ``impl='flash_interpret'`` and
# the functional executor via ``run_graph(..., interpret=True)``. A mutable
# module-global would be read at trace time and silently cached by jit.


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, n_kv: int, block_k: int
):
    """Grid: (BH, N/BQ). Blocks: q (1, BQ, D), k/v (1, N, D) full."""
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
    d = q.shape[-1]
    bq = q.shape[0]

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, n_kv // block_k, body, (acc, m, l))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def flash_attention(
    q: jnp.ndarray,  # (BH, N, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Non-causal fused attention; softmax(QK^T)V never touches HBM.

    Two regimes share one kernel:
    - long N (128-aligned): 128-row q blocks stream 128-row k/v blocks with
      online softmax (the flash recipe);
    - short N (the detector's area attention: N = HW/area, e.g. 400): one
      q/k/v block per (batch*head) grid cell, the whole N x N score matrix
      lives in VMEM. This is the production case for AAttn, where the XLA
      path materializes (BH, N, N) f32 score tensors in HBM and becomes
      bandwidth-bound (~245 MB per block at 40x40/area-4, x-scale).

    D pads to the 128-lane width; N needs only bf16 sublane alignment (16).
    """
    bh, n, d = q.shape
    if n % BLOCK_Q == 0:
        bq = bk = BLOCK_Q
    else:
        assert n <= 1024 and n % 16 == 0, f"unaligned N={n} must be <=1024, 16k"
        bq = bk = n
    if scale is None:
        scale = 1.0 / (d**0.5)
    d_pad = (-d) % 128
    if d_pad:
        pad = ((0, 0), (0, 0), (0, d_pad))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    dp = q.shape[-1]

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_kv=n, block_k=bk),
        grid=(bh, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, dp), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[..., :d] if d_pad else out


def _area_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads, hd):
    """Grid: (G,). Blocks: (1, N, C) with C = num_heads*hd head-packed lanes.

    All heads of one (batch*area) group are processed in one cell, slicing
    the lane dimension per head — no head transpose, no D-padding copies in
    HBM (the einsum path materializes (G*H, N, N) f32 score tensors; the
    folded-head flash path pads D 32->128, quadrupling q/k/v traffic)."""
    q = q_ref[0].astype(jnp.float32) * scale  # (N, C)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        lo = h * hd
        s = jax.lax.dot_general(
            q[:, lo : lo + hd], k[:, lo : lo + hd],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (N, N)
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v[:, lo : lo + hd],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + hd] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def area_attention(
    q: jnp.ndarray,  # (G, N, C) — heads packed in the channel/lane dim
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-head attention in the detector's natural layout.

    The AAttn head produces q/k/v as (B*area, N, C) channel-packed maps
    (reference ``block.py:1228-1262``); this kernel consumes them directly —
    softmax(Q_h K_h^T) V_h per head entirely in VMEM. Inference-path only
    (no VJP; training uses the einsum path).
    """
    g, n, c = q.shape
    hd = c // num_heads
    assert n % 16 == 0 and n * n * 4 <= 8 * 2**20, f"N={n} out of kernel range"
    if scale is None:
        scale = 1.0 / (hd**0.5)
    c_pad = (-c) % 128
    if c_pad:  # sub-128 channel tails (small scales) pad once
        pad = ((0, 0), (0, 0), (0, c_pad))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    cp = q.shape[-1]
    out = pl.pallas_call(
        functools.partial(
            _area_attn_kernel, scale=scale, num_heads=num_heads, hd=hd
        ),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n, cp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=pl.BlockSpec((1, n, cp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, n, cp), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[..., :c] if c_pad else out


def _area_attn_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, num_heads, hd
):
    """Flash backward: grid (G,), everything for one group stays in VMEM.

    Per head the (N, N) score matrix S and softmax P are *recomputed* from
    q/k (flash-style recomputation — nothing quadratic is saved between
    forward and backward, and nothing quadratic ever reaches HBM; the
    previous einsum backward materialized (G·H, N, N) f32 S/P/dP tensors in
    HBM and made the kernel-forward variant a net loss under remat).

      dV = Pᵀ·dO,  dP = dO·Vᵀ,  dS = P ∘ (dP − rowsum(dP ∘ P)),
      dQ = scale·dS·K,  dK = dSᵀ·(scale·Q)
    """
    q = q_ref[0].astype(jnp.float32) * scale  # (N, C), pre-scaled
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    for h in range(num_heads):
        lo = h * hd
        qh, kh, vh, doh = (
            q[:, lo : lo + hd],
            k[:, lo : lo + hd],
            v[:, lo : lo + hd],
            do[:, lo : lo + hd],
        )
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, N)
        p = jnp.exp(s - s.max(axis=-1, keepdims=True))
        p = p / p.sum(axis=-1, keepdims=True)
        dv = jax.lax.dot_general(
            p, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # Pᵀ·dO (N, hd)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # dO·Vᵀ (N, N)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = (
            jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # dSᵀ·(scale·Q)
        dq_ref[0, :, lo : lo + hd] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, lo : lo + hd] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, lo : lo + hd] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def area_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    do: jnp.ndarray,
    num_heads: int,
    scale: float | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(dq, dk, dv) for ``area_attention`` — one VMEM-resident Pallas pass."""
    g, n, c = q.shape
    hd = c // num_heads
    assert n % 16 == 0 and n * n * 4 <= 8 * 2**20, f"N={n} out of kernel range"
    if scale is None:
        scale = 1.0 / (hd**0.5)
    c_pad = (-c) % 128
    if c_pad:
        pad = ((0, 0), (0, 0), (0, c_pad))
        q, k, v, do = (jnp.pad(t, pad) for t in (q, k, v, do))
    cp = q.shape[-1]
    spec = pl.BlockSpec((1, n, cp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((g, n, cp), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _area_attn_bwd_kernel, scale=scale, num_heads=num_heads, hd=hd
        ),
        grid=(g,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )(q, k, v, do)
    if c_pad:
        dq, dk, dv = dq[..., :c], dk[..., :c], dv[..., :c]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def area_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """``area_attention`` with a hand-written VJP: forward = the Pallas
    kernel (no HBM score matrix), backward = the flash backward kernel
    (``area_attention_bwd`` — S and P recomputed per head in VMEM, so the
    quadratic intermediates never touch HBM in either direction). Only
    (q, k, v) are saved between forward and backward."""
    return area_attention(q, k, v, num_heads, interpret=interpret)


def _aat_fwd(q, k, v, num_heads, interpret):
    return area_attention(q, k, v, num_heads, interpret=interpret), (q, k, v)


def _aat_bwd(num_heads, interpret, res, g):
    q, k, v = res
    return area_attention_bwd(q, k, v, g, num_heads, interpret=interpret)


area_attention_trainable.defvjp(_aat_fwd, _aat_bwd)


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  scale: float | None = None) -> jnp.ndarray:
    """Reference path: materialized softmax(QK^T)V (XLA-fused)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


def flash_attention_auto(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, min_seq: int = 8192
) -> jnp.ndarray:
    """Dispatch: flash kernel only where its O(N) memory matters.

    Measured on v5e (BH=16, N=4096, D=64, bf16): XLA's fused batched-matmul
    path is ~3.6x faster (30 vs 8 effective TFLOPs) because head_dim < 128
    wastes MXU lanes in the kernel, while XLA folds heads into the batch.
    The kernel wins only when the materialized N^2 attention matrix would
    pressure HBM (N >= ~8k at these batch sizes) — so that is the default
    crossover. Correctness is identical (<=1e-3 in bf16).
    """
    n = q.shape[1]
    if (
        jax.default_backend() == "tpu"
        and n >= min_seq
        and n % BLOCK_K == 0
    ):
        return flash_attention(q, k, v)
    return xla_attention(q, k, v)
