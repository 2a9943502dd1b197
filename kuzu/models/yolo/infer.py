"""Fused functional inference executor for the YOLO graph.

The TPU analogue of the reference's inference-time model surgery
(``BaseModel.fuse`` folds Conv+BN pairs before predict/export,
``yolov12/ultralytics/nn/tasks.py:92+``): a pure function over the flax
param pytree that

- folds every BatchNorm into its conv's weights/bias (one multiply per
  weight at trace time — XLA constant-folds nothing here since weights are
  jit arguments, but the fold is ~60M cheap FLOPs, invisible next to the
  conv itself);
- runs area attention through the fused Pallas kernel
  (``kuzu.ops.flash_attention.area_attention``);
- keeps everything else as plain lax ops with no module/scope overhead.

Outputs match ``YoloGraph.apply(train=False)`` to bf16 rounding (BN folding
reassociates ``conv(x,w)*s`` into ``conv(x, w*s)``); the e2e decode+NMS
parity is asserted on-chip and in ``tests/test_yolo_infer.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def _fold_bn(conv_p: dict, bn_p: dict, bn_s: dict, eps: float = 1e-3):
    """Fold BN(scale,bias,mean,var) into (W, b) of the preceding conv."""
    w = conv_p["kernel"].astype(jnp.float32)
    scale = bn_p["scale"].astype(jnp.float32)
    bias = bn_p["bias"].astype(jnp.float32)
    mean = bn_s["mean"].astype(jnp.float32)
    var = bn_s["var"].astype(jnp.float32)
    mult = scale * lax.rsqrt(var + eps)
    return (w * mult).astype(jnp.bfloat16), (bias - mean * mult).astype(
        jnp.float32
    )


class _P:
    """Cursor over the nested param/batch_stats dicts of one module."""

    def __init__(self, params: dict, stats: dict):
        self.params = params
        self.stats = stats

    def child(self, name: str) -> "_P":
        return _P(self.params[name], self.stats.get(name, {}))


def conv(p: _P, x, s: int = 1, g: int = 1, act: bool = True, k: int | None = None):
    """Conv + folded-BN + SiLU (the ``modules.Conv`` trio).

    Grouped (non-depthwise) convs run as g independent convs + concat:
    XLA's feature_group_count lowering measured 1.6x slower than the split
    at the v12 stem's g=4 shapes (PERFORMANCE.md round-2 notes)."""
    w, b = _fold_bn(p.params["conv"], p.params["bn"], p.stats["bn"])
    kh = w.shape[0] if k is None else k
    pad = kh // 2
    cin = x.shape[-1]
    if 1 < g < cin:
        cg, og = cin // g, w.shape[-1] // g
        y = jnp.concatenate(
            [
                lax.conv_general_dilated(
                    x[..., gi * cg : (gi + 1) * cg],
                    w[..., gi * og : (gi + 1) * og],
                    (s, s), [(pad, pad), (pad, pad)], dimension_numbers=DN,
                )
                for gi in range(g)
            ],
            axis=-1,
        )
    else:
        y = lax.conv_general_dilated(
            x, w, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=DN, feature_group_count=g,
        )
    y = y + b.astype(y.dtype)
    return jax.nn.silu(y) if act else y


def stem_conv_s2d(p: _P, x):
    """The stem Conv(3->C, k3, s2) as a space-to-depth conv — same math,
    MXU-friendlier layout (round-4 VERDICT item 6).

    A 3-channel k3 conv has an im2col contraction of K=27 against the
    MXU's 128-lane tiles (~21% utilization). Packing 2x2 pixel blocks into
    channels (x (B,H,W,3) -> X (B,H/2,W/2,12)) turns it into a k2 s1 conv
    with K=48 at a quarter of the positions — identical output up to
    summation order (the well-known TPU ResNet space-to-depth stem
    rewrite, applied here at weight-load time instead of train time).
    Tap mapping: output y[i,j] reads x[2i+di, 2j+dj], di,dj in {-1,0,1};
    with X[p,q,(u,v,c)] = x[2p+u, 2q+v, c] those taps live in X rows/cols
    {i-1, i} x {j-1, j}, so W2[P,Q,(u,v,c),o] = w[2P+u-2+1, 2Q+v-2+1, c, o]
    where in-range, else zero.
    """
    from kuzu.ops.s2d import s2d_kernel, space_to_depth

    w, bias = _fold_bn(p.params["conv"], p.params["bn"], p.stats["bn"])
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3) and cin == 3
    X = space_to_depth(x)
    # W2 built by gather from the padded original kernel (traced on the
    # weight argument; negligible vs the conv itself)
    w2 = s2d_kernel(w)
    y = lax.conv_general_dilated(
        X, w2.astype(X.dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=DN,
    )
    y = y + bias.astype(y.dtype)
    return jax.nn.silu(y)


def stem_pair_packed(p0: _P, p1: _P, x, g1: int = 1):
    """Nodes 0+1 (both k3 s2 convs) as two k2 convs on a 4x4
    space-to-depth packing (round-5 VERDICT item 6: fold P1 into the s2d
    transform so channels start >=128).

    The P1 activation is the stem's HBM problem: (B, H/2, W/2, C0) with
    C0 = 96 pads to 128 lanes and round-trips at full half-resolution.
    Packing 2x2 output pixels into channels keeps it at quarter grid with
    4*C0 = 384 lanes (no padding, 4x less padded volume), and node 1 then
    consumes the packed tensor directly:

    - stage A: X4 = s2d(x, 4) (B, H/4, W/4, 16*cin); node0's k3 s2 conv
      over x becomes a k2 s1 conv over X4 producing Y packed (o-major
      channel order o*4 + a*2 + b so groups stay contiguous): output
      pixel y[2p+a, 2q+b] reads x[4p + (2a+di), ...], and 2a+di spans
      {-1..3} = packed rows {p-1, p} -> kernel taps (k, u) with
      di = 4k - 4 + u - 2a, zero where |di| > 1.
    - stage B: node1's k3 s2 conv over y becomes a k2 s1 conv over Y:
      z[m, n] reads y[2m+di, ...] = Y rows {m-1, m}, taps (k, a) with
      di = 2(k-1) + a, zero at (k=0, a=0). Grouped node1 (v12 P2 conv is
      g=2) slices packed channels per group — contiguous by the o-major
      order.

    Same math as the native pair up to summation order; SiLU is
    elementwise so it commutes with the packing.
    """
    w0, b0 = _fold_bn(p0.params["conv"], p0.params["bn"], p0.stats["bn"])
    w1, b1 = _fold_bn(p1.params["conv"], p1.params["bn"], p1.stats["bn"])
    cin, c0 = w0.shape[2], w0.shape[3]
    c1 = w1.shape[3]
    b_, h, wd, _ = x.shape
    X = (
        x.reshape(b_, h // 4, 4, wd // 4, 4, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b_, h // 4, wd // 4, 16 * cin)
    )

    # ---- stage A kernel: (2, 2, (u,v,c)=16*cin, (o,a,b)=4*c0)
    k, u, a = np.meshgrid(np.arange(2), np.arange(4), np.arange(2), indexing="ij")
    di = 4 * k - 4 + u - 2 * a  # (2, 4, 2)
    ok = (di >= -1) & (di <= 1)
    idx = np.clip(di + 1, 0, 2)
    # joint axes (k, u, l, v, a, b): row index depends on (k, u, a),
    # column index on (l, v, b)
    wa = (
        w0[idx[:, :, None, None, :, None], idx[None, None, :, :, None, :]]
        * (ok[:, :, None, None, :, None] & ok[None, None, :, :, None, :])[
            ..., None, None
        ]
    )  # (k, u, l, v, a, b, cin, c0)
    wa = jnp.asarray(wa).transpose(0, 2, 1, 3, 6, 7, 4, 5)  # k,l,u,v,c,o,a,b
    wa = wa.reshape(2, 2, 16 * cin, 4 * c0)
    y = lax.conv_general_dilated(
        X, wa.astype(X.dtype), (1, 1), [(1, 0), (1, 0)], dimension_numbers=DN
    )
    y = jax.nn.silu(y + jnp.repeat(b0, 4).astype(y.dtype))

    # ---- stage B kernel: (2, 2, (o,a,b)=4*c0g, c1). A grouped flax conv
    # kernel is already group-local on the input dim (c0g = c0 // g1), so
    # groups slice only the packed input tensor + the kernel's output dim.
    c0g = w1.shape[2]
    k, a = np.meshgrid(np.arange(2), np.arange(2), indexing="ij")
    di = 2 * (k - 1) + a  # (2, 2) in {-2..1}
    ok = di >= -1
    idx = np.clip(di + 1, 0, 2)
    # wb[k, a, l, b, o, o2]
    wb = (
        w1[idx[:, :, None, None], idx[None, None, :, :]]
        * (ok[:, :, None, None] & ok[None, None])[..., None, None]
    )
    wb = jnp.asarray(wb).transpose(0, 2, 4, 1, 3, 5)  # k,l,o,a,b,o2
    wb = wb.reshape(2, 2, 4 * c0g, c1)
    if g1 > 1:
        cgp, og = 4 * c0g, c1 // g1
        z = jnp.concatenate(
            [
                lax.conv_general_dilated(
                    y[..., gi * cgp : (gi + 1) * cgp],
                    wb[:, :, :, gi * og : (gi + 1) * og].astype(y.dtype),
                    (1, 1), [(1, 0), (1, 0)], dimension_numbers=DN,
                )
                for gi in range(g1)
            ],
            axis=-1,
        )
    else:
        z = lax.conv_general_dilated(
            y, wb.astype(y.dtype), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=DN,
        )
    return jax.nn.silu(z + b1.astype(z.dtype))


def plain_conv(p: dict, x):
    """Bias-carrying 1x1 conv with no BN (Detect head leaves)."""
    w = p["kernel"].astype(x.dtype)
    y = lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=DN)
    return y + p["bias"].astype(y.dtype)


def bottleneck(p: _P, x, shortcut: bool = True):
    y = conv(p.child("cv1"), x)
    y = conv(p.child("cv2"), y)
    return x + y if shortcut and x.shape[-1] == y.shape[-1] else y


def c3(p: _P, x, n: int = 2, shortcut: bool = True):
    a = conv(p.child("cv1"), x)
    for i in range(n):
        a = bottleneck(p.child(f"m{i}"), a, shortcut)
    b = conv(p.child("cv2"), x)
    return conv(p.child("cv3"), jnp.concatenate([a, b], axis=-1))


def c3k(p: _P, x, shortcut: bool = True):
    return c3(p.child("c3"), x, n=2, shortcut=shortcut)


def c3k2(p: _P, x, n: int, c3k_flag: bool, shortcut: bool = True):
    y = conv(p.child("cv1"), x)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for i in range(n):
        if c3k_flag:
            parts.append(c3k(p.child(f"m{i}"), parts[-1], shortcut))
        else:
            parts.append(bottleneck(p.child(f"m{i}"), parts[-1], shortcut))
    return conv(p.child("cv2"), jnp.concatenate(parts, axis=-1))


def c2f(p: _P, x, n: int, shortcut: bool = False):
    y = conv(p.child("cv1"), x)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for i in range(n):
        parts.append(bottleneck(p.child(f"m{i}"), parts[-1], shortcut))
    return conv(p.child("cv2"), jnp.concatenate(parts, axis=-1))


def aattn(p: _P, x, num_heads: int, area: int, interpret: bool = False):
    """Area attention via the fused Pallas kernel (falls back to einsum on
    shapes the kernel can't take — mirrors ``modules.AAttn``)."""
    import sys

    import kuzu.ops.flash_attention  # noqa: F401
    _fa = sys.modules["kuzu.ops.flash_attention"]

    B, H, W, C = x.shape
    dim = p.params["v"]["conv"]["kernel"].shape[-1]
    hd = dim // num_heads
    qk = conv(p.child("qk"), x, act=False)
    v = conv(p.child("v"), x, act=False)
    pe = conv(p.child("pe"), v, g=dim, act=False)
    area = area if area > 0 else 1
    na = (H * W) // area
    qk_t = qk.reshape(B * area, na, 2 * dim)
    v_t = v.reshape(B * area, na, dim)
    q, k = qk_t[..., :dim], qk_t[..., dim:]
    kernel_ok = (
        na % 16 == 0
        and na * na * 4 <= 8 * 2**20
        and (jax.default_backend() == "tpu" or interpret)
    )
    if kernel_ok:
        out = _fa.area_attention(
            q, k, v_t, num_heads, interpret=interpret
        ).reshape(B, H, W, dim)
    else:
        out = _fa.xla_attention(
            q.reshape(B * area, na, num_heads, hd)
            .transpose(0, 2, 1, 3)
            .reshape(-1, na, hd),
            k.reshape(B * area, na, num_heads, hd)
            .transpose(0, 2, 1, 3)
            .reshape(-1, na, hd),
            v_t.reshape(B * area, na, num_heads, hd)
            .transpose(0, 2, 1, 3)
            .reshape(-1, na, hd),
        )
        out = (
            out.reshape(B * area, num_heads, na, hd)
            .transpose(0, 2, 1, 3)
            .reshape(B, H, W, dim)
        )
    return conv(p.child("proj"), out + pe, act=False)


def ablock(p: _P, x, num_heads: int, area: int, interpret: bool = False):
    B, H, W, C = x.shape
    ar = max(area, 1)
    na = (H * W) // ar
    hd = C // num_heads
    # whole-block Pallas kernel: every matmul 128-lane aligned, one HBM
    # read/write per block (see ops/fused_ablock.py)
    fused_ok = (
        C % 128 == 0
        and hd % 8 == 0
        and na % 16 == 0
        and na * na * 4 <= 8 * 2**20
        and (jax.default_backend() == "tpu" or interpret)
    )
    if fused_ok:
        from kuzu.ops.fused_ablock import ablock_weights, fused_ablock

        attn_p = p.child("attn")
        v = conv(attn_p.child("v"), x, act=False)
        pe = conv(attn_p.child("pe"), v, g=C, act=False)
        w = ablock_weights(p.params, p.stats)
        out = fused_ablock(
            x.reshape(B, H * W, C),
            v.reshape(B, H * W, C),
            pe.reshape(B, H * W, C),
            tuple(w), ar, num_heads, interpret=interpret,
        )
        return out.reshape(B, H, W, C)
    x = x + aattn(p.child("attn"), x, num_heads, area, interpret)
    y = conv(p.child("mlp1"), x)
    y = conv(p.child("mlp2"), y, act=False)
    return x + y


def a2c2f(p: _P, x, n: int, a2: bool, area: int, residual: bool,
          interpret: bool = False):
    c_ = p.params["cv1"]["conv"]["kernel"].shape[-1]
    num_heads = max(c_ // 32, 1)
    y = [conv(p.child("cv1"), x)]
    for i in range(n):
        if a2:
            t = ablock(p.child(f"m{i}_0"), y[-1], num_heads, area, interpret)
            t = ablock(p.child(f"m{i}_1"), t, num_heads, area, interpret)
        else:
            t = c3k(p.child(f"m{i}"), y[-1])
        y.append(t)
    out = conv(p.child("cv2"), jnp.concatenate(y, axis=-1))
    if a2 and residual:
        gamma = p.params["gamma"]
        return x + gamma.astype(out.dtype) * out
    return out


def c2psa(p: _P, x, n: int):
    y = conv(p.child("cv1"), x)
    c = y.shape[-1] // 2
    a, b = y[..., :c], y[..., c:]
    heads = max(c // 64, 1)
    for i in range(n):
        blk = p.child(f"m{i}")
        b = b + _psa_attn(blk.child("attn"), b, heads)
        f = conv(blk.child("ffn1"), b)
        f = conv(blk.child("ffn2"), f, act=False)
        b = b + f
    return conv(p.child("cv2"), jnp.concatenate([a, b], axis=-1))


def _psa_attn(p: _P, x, num_heads: int):
    from kuzu.ops.flash_attention import xla_attention

    B, H, W, C = x.shape
    dim = p.params["proj"]["conv"]["kernel"].shape[-1]
    hd = dim // num_heads
    kd = int(hd * 0.5)
    qkv = conv(p.child("qkv"), x, act=False)
    t = qkv.reshape(B, H * W, num_heads, 2 * kd + hd)
    q, k, v = t[..., :kd], t[..., kd : 2 * kd], t[..., 2 * kd :]

    def fold(z):
        return z.transpose(0, 2, 1, 3).reshape(B * num_heads, H * W, -1)

    out = xla_attention(fold(q), fold(k), fold(v), scale=kd**-0.5)
    out = (
        out.reshape(B, num_heads, H * W, hd)
        .transpose(0, 2, 1, 3)
        .reshape(B, H, W, dim)
    )
    pe = conv(p.child("pe"), v.reshape(B, H, W, dim), g=dim, act=False)
    return conv(p.child("proj"), out + pe, act=False)


def repconv(p: _P, x):
    a = conv(p.child("conv1"), x, act=False)
    b = conv(p.child("conv2"), x, act=False)
    return jax.nn.silu(a + b)


def repcsp(p: _P, x, n: int):
    a = conv(p.child("cv1"), x)
    for i in range(n):
        m = p.child(f"m{i}")
        y = repconv(m.child("cv1"), a)
        y = conv(m.child("cv2"), y)
        a = a + y if a.shape[-1] == y.shape[-1] else y
    b = conv(p.child("cv2"), x)
    return conv(p.child("cv3"), jnp.concatenate([a, b], axis=-1))


def repncspelan4(p: _P, x, n: int):
    y = conv(p.child("cv1"), x)
    half = y.shape[-1] // 2
    parts = [y[..., :half], y[..., half:]]
    t = repcsp(p.child("cv2_csp"), parts[-1], n)
    t = conv(p.child("cv2_conv"), t)
    parts.append(t)
    t = repcsp(p.child("cv3_csp"), t, n)
    t = conv(p.child("cv3_conv"), t)
    parts.append(t)
    return conv(p.child("cv4"), jnp.concatenate(parts, axis=-1))


def adown(p: _P, x):
    x = lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "VALID"
    ) * 0.25
    c1 = x.shape[-1]
    x1, x2 = x[..., : c1 // 2], x[..., c1 // 2 :]
    x1 = conv(p.child("cv1"), x1, s=2)
    x2 = lax.reduce_window(
        x2, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    x2 = conv(p.child("cv2"), x2)
    return jnp.concatenate([x1, x2], axis=-1)


def sppelan(p: _P, x, k: int = 5):
    pad = k // 2
    y = [conv(p.child("cv1"), x)]
    for _ in range(3):
        y.append(
            lax.reduce_window(
                y[-1], -jnp.inf, lax.max, (1, k, k, 1), (1, 1, 1, 1),
                [(0, 0), (pad, pad), (pad, pad), (0, 0)],
            )
        )
    return conv(p.child("cv5"), jnp.concatenate(y, axis=-1))


def scdown(p: _P, x, k: int, s: int):
    y = conv(p.child("cv1"), x)
    return conv(p.child("cv2"), y, s=s, g=y.shape[-1], act=False)


def repvggdw(p: _P, x):
    a = conv(p.child("conv"), x, g=x.shape[-1], act=False)
    b = conv(p.child("conv1"), x, g=x.shape[-1], act=False)
    return jax.nn.silu(a + b)


def cib(p: _P, x, lk: bool, shortcut: bool = True):
    c1 = x.shape[-1]
    y = conv(p.child("dw1"), x, g=c1)
    y = conv(p.child("pw1"), y)
    if lk:
        y = repvggdw(p.child("rep"), y)
    else:
        y = conv(p.child("dw2"), y, g=y.shape[-1])
    y = conv(p.child("pw2"), y)
    y = conv(p.child("dw3"), y, g=y.shape[-1])
    return x + y if shortcut and c1 == y.shape[-1] else y


def c2fcib(p: _P, x, n: int, shortcut: bool, lk: bool):
    y = conv(p.child("cv1"), x)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for i in range(n):
        parts.append(cib(p.child(f"m{i}"), parts[-1], lk, shortcut))
    return conv(p.child("cv2"), jnp.concatenate(parts, axis=-1))


def psa(p: _P, x):
    y = conv(p.child("cv1"), x)
    c = y.shape[-1] // 2
    a, b = y[..., :c], y[..., c:]
    b = b + _psa_attn(p.child("attn"), b, max(c // 64, 1))
    f = conv(p.child("ffn1"), b)
    f = conv(p.child("ffn2"), f, act=False)
    b = b + f
    return conv(p.child("cv2"), jnp.concatenate([a, b], axis=-1))


def sppf(p: _P, x, k: int = 5):
    y = conv(p.child("cv1"), x)
    pools = [y]
    pad = k // 2
    for _ in range(3):
        pools.append(
            lax.reduce_window(
                pools[-1], -jnp.inf, lax.max, (1, k, k, 1), (1, 1, 1, 1),
                [(0, 0), (pad, pad), (pad, pad), (0, 0)],
            )
        )
    return conv(p.child("cv2"), jnp.concatenate(pools, axis=-1))


def upsample2x(x):
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    return jnp.broadcast_to(x, (b, h, 2, w, 2, c)).reshape(b, h * 2, w * 2, c)


def detect(p: _P, feats: list, nc: int, legacy: bool):
    outs = []
    for i, x in enumerate(feats):
        b = conv(p.child(f"box{i}_0"), x)
        b = conv(p.child(f"box{i}_1"), b)
        b = plain_conv(p.params[f"box{i}_2"], b)
        if legacy:
            c = conv(p.child(f"cls{i}_0"), x)
            c = conv(p.child(f"cls{i}_1"), c)
        else:
            # DWConv modules nest their Conv under a 'dw' child
            c = conv(p.child(f"cls{i}_0dw").child("dw"), x, g=x.shape[-1])
            c = conv(p.child(f"cls{i}_0pw"), c)
            cch = c.shape[-1]
            c = conv(p.child(f"cls{i}_1dw").child("dw"), c, g=cch)
            c = conv(p.child(f"cls{i}_1pw"), c)
        c = plain_conv(p.params[f"cls{i}_2"], c)
        outs.append(jnp.concatenate([b, c], axis=-1))
    return outs


def proto(p: _P, x):
    """Mask prototype head (``modules.Proto``): conv3 -> 2x up -> conv3 -> conv1."""
    x = conv(p.child("cv1"), x)
    x = upsample2x(x)
    x = conv(p.child("cv2"), x)
    return conv(p.child("cv3"), x)


def segment(p: _P, feats: list, nc: int, legacy: bool, nm: int):
    """Segment head (``modules.Segment``): Detect + coeff branches + Proto."""
    protos = proto(p.child("proto"), feats[0])
    coeffs = []
    for i, x in enumerate(feats):
        m = conv(p.child(f"m{i}_0"), x)
        m = conv(p.child(f"m{i}_1"), m)
        m = plain_conv(p.params[f"m{i}_2"], m)
        coeffs.append(m.reshape(m.shape[0], -1, nm))
    det = detect(p.child("detect"), feats, nc=nc, legacy=legacy)
    return {
        "det": det,
        "coeffs": jnp.concatenate(coeffs, axis=1).astype(jnp.float32),
        "protos": protos.astype(jnp.float32),
    }


def pose(p: _P, feats: list, nc: int, legacy: bool, kpt_shape):
    """Pose head (``modules.Pose``): Detect + keypoint branches."""
    K, D = kpt_shape
    nk = K * D
    kpts = []
    for i, x in enumerate(feats):
        m = conv(p.child(f"k{i}_0"), x)
        m = conv(p.child(f"k{i}_1"), m)
        m = plain_conv(p.params[f"k{i}_2"], m)
        kpts.append(m.reshape(m.shape[0], -1, nk))
    det = detect(p.child("detect"), feats, nc=nc, legacy=legacy)
    raw = jnp.concatenate(kpts, axis=1).astype(jnp.float32)
    return {
        "det": det,
        "kpts_raw": raw.reshape(raw.shape[0], raw.shape[1], K, D),
    }


def obb(p: _P, feats: list, nc: int, legacy: bool, ne: int):
    """OBB head (``modules.OBB``): Detect + angle branches."""
    import math

    angles = []
    for i, x in enumerate(feats):
        m = conv(p.child(f"a{i}_0"), x)
        m = conv(p.child(f"a{i}_1"), m)
        m = plain_conv(p.params[f"a{i}_2"], m)
        angles.append(m.reshape(m.shape[0], -1, ne))
    det = detect(p.child("detect"), feats, nc=nc, legacy=legacy)
    raw = jnp.concatenate(angles, axis=1).astype(jnp.float32)
    return {"det": det, "angle": (jax.nn.sigmoid(raw) - 0.25) * math.pi}


def run_graph(
    spec: Any,
    variables: dict,
    images: jnp.ndarray,
    interpret: bool = False,
    stem_s2d: bool = False,
    stem_packed: bool = False,
) -> list:
    """Execute the parsed GraphSpec functionally (inference only).

    ``variables`` is the standard flax dict from ``YoloDetector.init``
    (params + batch_stats); images are (B, H, W, 3) float32/bf16.
    ``interpret=True`` runs the Pallas kernels in interpret mode (CPU
    testing) — explicit here because this function is traced under the
    caller's jit, so a mutable global would be silently cached.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    from kuzu.ops.images import from_uint8

    x = from_uint8(images, dtype=jnp.bfloat16)
    outputs: dict[int, jnp.ndarray] = {}
    cur = x
    result = None

    def _stem_fusable() -> bool:
        """stem_packed preconditions: nodes 0+1 are both k3 s2 act Convs
        (node0 g=1 from RGB), node1 reads only node0, nothing else reads
        node0, and the image tiles by 4."""
        if len(spec.nodes) < 2 or x.shape[1] % 4 or x.shape[2] % 4:
            return False
        n0, n1 = spec.nodes[0], spec.nodes[1]
        for nd in spec.nodes[2:]:
            if 0 in nd.frm:
                return False
        for nd, need_g1 in ((n0, True), (n1, False)):
            if nd.module != "Conv":
                return False
            a = nd.args
            if (a[2] if len(a) > 2 else 1) != 2:
                return False
            if need_g1 and (a[4] if len(a) > 4 else 1) != 1:
                return False
            if not (a[5] if len(a) > 5 else True):
                return False
            k = params[f"n{nd.index}_Conv"]["conv"]["kernel"]
            if k.shape[:2] != (3, 3):
                return False
        return x.shape[-1] == 3 and list(n1.frm) == [0]

    fuse_stem = stem_packed and _stem_fusable()
    for node in spec.nodes:
        if fuse_stem and node.index == 0:
            continue  # produced fused with node 1 below
        if fuse_stem and node.index == 1:
            g1 = node.args[4] if len(node.args) > 4 else 1
            cur = stem_pair_packed(
                _P(params["n0_Conv"], stats.get("n0_Conv", {})),
                _P(params["n1_Conv"], stats.get("n1_Conv", {})),
                x, g1=g1,
            )
            if node.index in spec.save:
                outputs[node.index] = cur
            continue
        ins = [cur if f == node.index - 1 else outputs[f] for f in node.frm]
        m, a = node.module, node.args
        name = f"n{node.index}_{m}"
        p = _P(params.get(name, {}), stats.get(name, {}))
        if m == "Conv":
            s = a[2] if len(a) > 2 else 1
            g = a[4] if len(a) > 4 else 1
            act = a[5] if len(a) > 5 else True
            if (
                stem_s2d and node.index == 0 and s == 2 and g == 1 and act
                and ins[0].shape[-1] == 3 and ins[0].shape[1] % 2 == 0
                and ins[0].shape[2] % 2 == 0
                and p.params["conv"]["kernel"].shape[:2] == (3, 3)
            ):
                cur = stem_conv_s2d(p, ins[0])
            else:
                cur = conv(p, ins[0], s=s, g=g, act=act)
        elif m == "DWConv":
            s = a[2] if len(a) > 2 else 1
            cur = conv(p.child("dw"), ins[0], s=s, g=ins[0].shape[-1])
        elif m == "C3k2":
            cur = c3k2(p, ins[0], n=node.repeats, c3k_flag=a[1])
        elif m == "C2f":
            cur = c2f(p, ins[0], n=node.repeats, shortcut=a[1])
        elif m == "A2C2f":
            cur = a2c2f(
                p, ins[0], n=node.repeats, a2=a[1], area=a[2], residual=a[3],
                interpret=interpret,
            )
        elif m == "C2PSA":
            cur = c2psa(p, ins[0], n=node.repeats)
        elif m == "C2fCIB":
            cur = c2fcib(p, ins[0], n=node.repeats, shortcut=a[1], lk=a[2])
        elif m == "RepNCSPELAN4":
            cur = repncspelan4(p, ins[0], n=a[3])
        elif m == "ADown":
            cur = adown(p, ins[0])
        elif m == "SPPELAN":
            cur = sppelan(p, ins[0])
        elif m == "SCDown":
            cur = scdown(p, ins[0], k=a[1], s=a[2])
        elif m == "PSA":
            cur = psa(p, ins[0])
        elif m == "SPPF":
            cur = sppf(p, ins[0], k=a[1])
        elif m == "Upsample":
            cur = upsample2x(ins[0])
        elif m == "Concat":
            cur = jnp.concatenate(ins, axis=-1)
        elif m == "Detect":
            result = detect(p, ins, nc=spec.nc, legacy=spec.legacy_head)
            cur = ins[0]
        elif m == "Segment":
            result = segment(
                p, ins, nc=spec.nc, legacy=spec.legacy_head, nm=a[1]
            )
            cur = ins[0]
        elif m == "OBB":
            result = obb(p, ins, nc=spec.nc, legacy=spec.legacy_head, ne=a[1])
            cur = ins[0]
        elif m == "Pose":
            result = pose(
                p, ins, nc=spec.nc, legacy=spec.legacy_head,
                kpt_shape=tuple(a[1]),
            )
            cur = ins[0]
        elif m == "v10Detect":
            # inference consumes only the one2one branch (decode drops
            # one2many); mirror the flax module's dict contract
            result = {
                "one2many": detect(
                    p.child("one2many"), ins, nc=spec.nc, legacy=False
                ),
                "one2one": detect(
                    p.child("one2one"), ins, nc=spec.nc, legacy=False
                ),
            }
            cur = ins[0]
        else:  # pragma: no cover
            raise ValueError(f"unknown module '{m}'")
        if node.index in spec.save:
            outputs[node.index] = cur
    assert result is not None
    return result
