"""Fused C3k2 block as one Pallas TPU kernel (EXPERIMENTAL — not wired in).

Status: numerically correct (interpret-mode parity test in
``tests/test_yolo_infer.py``), but the col-packed tap concatenation hits a
Mosaic limitation on real TPU ("result/input offset mismatch on non-concat
dimension" for lane-concat of sublane-offset slices), and the roofline
analysis shows the 48-channel bottleneck matmuls pad N 48->128 on the MXU
(2.7x) regardless of who issues them — bounding the win over XLA to ~1.5x
for substantial complexity. Kept as the starting point for a revisit with
roll-based taps; the shipped stem path stays on XLA convs via
``kuzu.models.yolo.infer.run_graph`` (BN-folded).

The x-scale stem's C3k2 blocks (e=0.25, c3k=True: 16 small-channel convs at
160²/80² resolution) are bandwidth-bound under XLA: every conv round-trips
a 48/96-channel activation through HBM with lanes padded to 128 (measured
4.1 + 3.8 ms of the 30 ms batch-8 forward — PERFORMANCE.md). This kernel
runs the whole block per row-band tile with every intermediate resident in
VMEM: HBM sees one read of x and one write of y.

Semantics parity with ``kuzu.models.yolo.modules.C3k2`` (c3k=True, n=2,
shortcut=True — the reference's ``C3k2``/``C3k``/``Bottleneck`` chain,
``yolov12/ultralytics/nn/modules/block.py:725,1090``), with BatchNorm
pre-folded into the conv weights:

    cv1(1x1) -> split(a, b) -> m0 = C3k(b) -> m1 = C3k(m0)
    -> cv2(1x1) over concat(a, b, m0, m1)
    C3k: cv3(1x1)( concat( bottleneck²(cv1(x)), cv2(x) ) )
    bottleneck: x + conv3x3(conv3x3(x))       (all convs + SiLU)

SAME-conv zero padding at image borders is reproduced exactly: the input
arrives zero-padded by the full halo (8 = deepest 3x3 chain), and every
conv output is re-masked to zero outside the image so the next conv's
implicit padding reads true zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8  # 2 C3k x 2 bottlenecks x 2 convs, one row/col per 3x3 conv


def _silu_f32(x):
    return x * jax.nn.sigmoid(x)


def _kernel(
    x_ref, *refs, T: int, H: int, W: int, hid: int, c: int, n: int
):
    """Grid (B, H/T). x block: (1, 1, T+2*HALO, W+2*HALO, Cin)."""
    wrefs, o_ref = refs[:-1], refs[-1]
    wi = iter(wrefs)

    def nxt():
        w = next(wi)
        b = next(wi)
        return w, b

    band = pl.program_id(1)
    R = T + 2 * HALO
    Wb = W + 2 * HALO

    def mask(t, lvl):
        """Zero cells outside the true image. ``t`` row0/col0 sit at padded
        coordinate (band*T + lvl, lvl)."""
        rows, cols = t.shape[0], t.shape[1]
        # 3D iotas: Mosaic rejects rank-expanding reshapes of i1 vectors
        r = (
            lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 0)
            + band * T + lvl
        )
        cc = lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1) + lvl
        ok = (
            (r >= HALO) & (r < HALO + H) & (cc >= HALO) & (cc < HALO + W)
        )
        return t * ok.astype(t.dtype)

    def c1x1(t, act=True):
        w, b = nxt()
        rows, cols, cin = t.shape
        y = lax.dot_general(
            t.reshape(rows * cols, cin), w[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b[...]
        if act:
            y = _silu_f32(y)
        return y.astype(t.dtype).reshape(rows, cols, -1)

    def c3x3(t, lvl_out):
        """3x3 SAME conv via col-packed taps; shrinks rows/cols by 2."""
        w, b = nxt()  # w: (9*C, N) with index dy*3C + dx*C + c
        rows, cols, cin = t.shape
        ro, co = rows - 2, cols - 2
        pc = jnp.concatenate(
            [t[:, 0:co, :], t[:, 1 : co + 1, :], t[:, 2 : co + 2, :]],
            axis=-1,
        )  # (rows, co, 3C)
        acc = jnp.zeros((ro * co, w.shape[1]), jnp.float32)
        for dy in range(3):
            acc = acc + lax.dot_general(
                pc[dy : ro + dy].reshape(ro * co, 3 * cin),
                w[dy * 3 * cin : (dy + 1) * 3 * cin, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = _silu_f32(acc + b[...]).astype(t.dtype).reshape(ro, co, -1)
        return mask(y, lvl_out)

    def crop(t, k):
        return t[k:-k, k:-k, :] if k else t

    x = x_ref[0, 0]  # (R, Wb, Cin)
    y = mask(c1x1(x), 0)
    a, b_part = y[..., :c], y[..., c:]
    parts = [(a, 0), (b_part, 0)]
    m, lvl = b_part, 0
    for _ in range(n):  # C3k modules
        l0 = lvl
        t = mask(c1x1(m), l0)  # c -> hid
        u = t
        for _ in range(2):  # bottlenecks
            u1 = c3x3(u, lvl + 1)
            u2 = c3x3(u1, lvl + 2)
            u = crop(u, 2) + u2
            lvl += 2
        byp = crop(mask(c1x1(m), l0), lvl - l0)  # c -> hid bypass
        mj = mask(
            c1x1(jnp.concatenate([u, byp], axis=-1)), lvl
        )  # 2*hid -> c
        parts.append((mj, lvl))
        m = mj
    final_lvl = lvl  # == HALO
    cat = jnp.concatenate(
        [crop(t, final_lvl - l) for (t, l) in parts], axis=-1
    )  # (T, W, (2+n)*c)
    o_ref[0] = c1x1(cat)  # (T, W, c2)


def fold_conv_bn(conv_p: dict, bn_p: dict, bn_s: dict, eps: float = 1e-3):
    """(W_hwio, scale, bias, mean, var) -> (W bf16, b f32) with BN folded."""
    w = conv_p["kernel"].astype(jnp.float32)
    mult = bn_p["scale"].astype(jnp.float32) * lax.rsqrt(
        bn_s["var"].astype(jnp.float32) + eps
    )
    b = bn_p["bias"].astype(jnp.float32) - bn_s["mean"].astype(
        jnp.float32
    ) * mult
    return (w * mult).astype(jnp.bfloat16), b


def _flat_w(w):
    """HWIO (kh, kw, C, N) -> (kh*kw*C, N) with dy-major tap order."""
    kh, kw, cin, n = w.shape
    return w.reshape(kh * kw * cin, n)


def c3k2_weights(params: dict, stats: dict, n: int = 2) -> list:
    """Flatten a flax C3k2 (c3k=True) param subtree into the kernel's
    ordered (W, b) list, BN folded."""

    def fold(path_p, path_s):
        return fold_conv_bn(path_p["conv"], path_p["bn"], path_s["bn"])

    out = []

    def add(pp, ps):
        w, b = fold(pp, ps)
        out.append(_flat_w(w))
        out.append(b.reshape(1, -1))

    add(params["cv1"], stats["cv1"])
    for j in range(n):
        c3p = params[f"m{j}"]["c3"]
        c3s = stats[f"m{j}"]["c3"]
        add(c3p["cv1"], c3s["cv1"])
        for bt in range(2):
            add(c3p[f"m{bt}"]["cv1"], c3s[f"m{bt}"]["cv1"])
            add(c3p[f"m{bt}"]["cv2"], c3s[f"m{bt}"]["cv2"])
        add(c3p["cv2"], c3s["cv2"])
        add(c3p["cv3"], c3s["cv3"])
    add(params["cv2"], stats["cv2"])
    return out


@functools.partial(
    jax.jit, static_argnames=("n", "tile", "interpret")
)
def fused_c3k2(
    x: jnp.ndarray,  # (B, H, W, Cin) bf16
    weights: tuple,  # ordered (W, b) pairs from c3k2_weights
    n: int = 2,
    tile: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, cin = x.shape
    c = weights[0].shape[1] // 2  # cv1 -> 2c
    hid = weights[2].shape[1]  # first C3k cv1 -> hid
    c2 = weights[-2].shape[1]
    T = tile
    while H % T:
        T //= 2
    nb = H // T
    R = T + 2 * HALO
    xp = jnp.pad(
        x, ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0))
    )  # zeros: the image-border padding every SAME conv sees
    bands = jnp.stack(
        [xp[:, i * T : i * T + R] for i in range(nb)], axis=1
    )  # (B, nb, R, Wb, Cin)

    wspecs = [
        pl.BlockSpec(w.shape, lambda b, i: (0,) * w.ndim,
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        functools.partial(
            _kernel, T=T, H=H, W=W, hid=hid, c=c, n=n
        ),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, R, W + 2 * HALO, cin),
                lambda b, i: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *wspecs,
        ],
        out_specs=pl.BlockSpec(
            (1, T, W, c2), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c2), x.dtype),
        interpret=interpret,
    )(bands, *weights)
    return out
