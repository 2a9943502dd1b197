"""Fused ABlock (area-attention block) core as one Pallas TPU kernel.

One grid cell = one (image, area) chunk of ``modules.ABlock``:

    qk = x·Wqk + b                       (in-kernel)
    per head:  o = softmax(q kᵀ/√d) v    (score matrix stays in VMEM)
    x₁ = x + (o + pe)·Wproj + b
    out = x₁ + W₂·silu(W₁·x₁)            (conv-MLP)

``v`` and its 5x5 depthwise positional conv ``pe`` are computed outside by
XLA (the depthwise conv is spatial and crosses area boundaries; computing it
in-kernel needed f32 rolls that blew the 16 MB VMEM budget) and stream in as
inputs. Everything else — five matmuls plus the attention — runs without
touching HBM between ops, with all matmul lanes 128-aligned (C=384/576/768
at l/x scale), so the MXU runs unpadded except the per-head slices.

Motivation (PERFORMANCE.md): after the area-attention kernel removed the
HBM score matrices, node 6 still spent ~4.6 ms/batch8 in its per-ABlock
1x1-conv matmuls — each a separate XLA op reading/writing (1600, 384-768)
activations through HBM at ~30% MFU.

BN is pre-folded into all weights (inference path only, no VJP). Parity
with ``modules.ABlock`` is asserted in interpret mode
(tests/test_yolo_infer.py) and at decode+NMS level on chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _kernel(
    x_ref, v_ref, pe_ref, wqk, bqk, wp, bp, w1, b1, w2, b2, o_ref, o_scr,
    *, heads: int,
):
    x = x_ref[0]  # (na, C) bf16
    v = v_ref[0]
    pe = pe_ref[0]
    na, C = x.shape
    hd = C // heads

    def mm(a, w, b, act=False):
        y = lax.dot_general(
            a, w[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b[...]
        if act:
            y = _silu(y)
        return y.astype(x.dtype)

    qk = mm(x, wqk, bqk)  # (na, 2C)

    scale = hd**-0.5
    for h in range(heads):
        lo = h * hd
        q_h = qk[:, lo : lo + hd].astype(jnp.float32) * scale
        k_h = qk[:, C + lo : C + lo + hd].astype(jnp.float32)
        v_h = v[:, lo : lo + hd].astype(jnp.float32)
        s = lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = s.max(axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / p.sum(axis=-1, keepdims=True)
        o_h = lax.dot_general(
            p, v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_scr[:, lo : lo + hd] = o_h.astype(x.dtype)

    attn = mm(o_scr[...] + pe, wp, bp)  # proj
    x1 = x + attn
    hmid = mm(x1, w1, b1, act=True)
    o_ref[0] = x1 + mm(hmid, w2, b2)


def ablock_weights(params: dict, stats: dict) -> list:
    """Flatten a flax ABlock param subtree into the kernel's weight list
    (qk / proj / mlp1 / mlp2 — v and pe run outside)."""
    from kuzu.ops.fused_c3k2 import fold_conv_bn

    def fold(name, sub="attn"):
        src_p = params[sub][name] if sub else params[name]
        src_s = stats[sub][name] if sub else stats[name]
        return fold_conv_bn(src_p["conv"], src_p["bn"], src_s["bn"])

    wqk, bqk = fold("qk")
    wp, bp = fold("proj")
    w1, b1 = fold("mlp1", sub=None)
    w2, b2 = fold("mlp2", sub=None)

    def flat1x1(w):  # (1, 1, Cin, Cout) -> (Cin, Cout)
        return w.reshape(w.shape[-2], w.shape[-1])

    return [
        flat1x1(wqk), bqk.reshape(1, -1),
        flat1x1(wp), bp.reshape(1, -1),
        flat1x1(w1), b1.reshape(1, -1),
        flat1x1(w2), b2.reshape(1, -1),
    ]


@functools.partial(
    jax.jit, static_argnames=("area", "heads", "interpret")
)
def fused_ablock(
    x: jnp.ndarray,  # (B, N, C) bf16, N row-major over (H, W)
    v: jnp.ndarray,  # (B, N, C) — the AAttn v conv output
    pe: jnp.ndarray,  # (B, N, C) — 5x5 depthwise positional conv of v
    weights: tuple,
    area: int,
    heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    B, N, C = x.shape
    assert N % area == 0
    na = N // area
    wspecs = [
        pl.BlockSpec(
            w.shape,
            functools.partial(lambda nd, i: (0,) * nd, w.ndim),
            memory_space=pltpu.VMEM,
        )
        for w in weights
    ]
    dspec = pl.BlockSpec(
        (1, na, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    xs = x.reshape(B * area, na, C)
    vs = v.reshape(B * area, na, C)
    pes = pe.reshape(B * area, na, C)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads),
        grid=(B * area,),
        in_specs=[dspec, dspec, dspec, *wspecs],
        out_specs=dspec,
        out_shape=jax.ShapeDtypeStruct((B * area, na, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((na, C), x.dtype)],
        interpret=interpret,
    )(xs, vs, pes, *weights)
    return out.reshape(B, N, C)
