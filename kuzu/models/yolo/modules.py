"""YOLOv12 building blocks in flax (NHWC, bf16-friendly).

Capability parity with the reference module zoo
(``yolov12/ultralytics/nn/modules/block.py``): Conv, Bottleneck, C2f/C3k2/C3k,
area attention (AAttn/ABlock/A2C2f R-ELAN), SPPF, Concat/Upsample, and the
anchor-free Detect head with DFL (``nn/modules/head.py:21-137``) — redesigned
for TPU: channels-last layout, batched matmul attention that XLA tiles onto
the MXU (the reference's flash-attn CUDA fast path becomes a Pallas/XLA
attention over area-grouped tokens), and static-shape decode.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class _S2dStridedConv(nn.Module):
    """A k3/s2 conv computed as a dense k2/s1 conv on a space-to-depth
    packing (``kuzu/ops/s2d.py``) — identical math up to float
    re-association, dense grad-input in the backward pass.

    Declares the SAME param tree as ``nn.Conv`` (``kernel`` of shape
    (3, 3, cin//g, cout)) so checkpoints and param-count parity are
    unaffected; grouped convs run as per-group dense convs (XLA's
    ``feature_group_count`` lowering measured 1.6x slower at inference,
    PERFORMANCE.md "Known headroom" — the same split applied to training).
    """

    c2: int
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from kuzu.ops.s2d import s2d_kernel, space_to_depth

        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin // self.g, self.c2),
        )
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        cin_g, cout_g = cin // self.g, self.c2 // self.g
        outs = []
        for j in range(self.g):
            w2 = s2d_kernel(kernel[..., j * cout_g:(j + 1) * cout_g])
            xs = space_to_depth(x[..., j * cin_g:(j + 1) * cin_g])
            outs.append(
                jax.lax.conv_general_dilated(
                    xs, w2, (1, 1), [(1, 0), (1, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
        return outs[0] if self.g == 1 else jnp.concatenate(outs, axis=-1)


class Conv(nn.Module):
    """Conv2d + BatchNorm + SiLU (reference ``Conv``).

    ``impl='s2d'`` rewrites an eligible k3/s2 conv (even H, W) through
    ``_S2dStridedConv`` — the training-path counterpart of the inference
    executor's ``stem_conv_s2d``; param tree unchanged.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32
    impl: str = "native"  # 'native' | 's2d'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.p if self.p is not None else self.k // 2
        if (
            self.impl == "s2d" and self.k == 3 and self.s == 2 and p == 1
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and self.c2 % self.g == 0 and x.shape[-1] % self.g == 0
        ):
            x = _S2dStridedConv(
                self.c2, g=self.g, dtype=self.dtype, name="conv"
            )(x)
        else:
            x = nn.Conv(
                self.c2,
                kernel_size=(self.k, self.k),
                strides=(self.s, self.s),
                padding=[(p, p), (p, p)],
                feature_group_count=self.g,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class DWConv(nn.Module):
    """Depthwise Conv (groups == channels)."""

    c2: int
    k: int = 3
    s: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, act=self.act, dtype=self.dtype, name="dw")(
            x, train=train
        )


class Bottleneck(nn.Module):
    """Standard bottleneck: cv1(k1) -> cv2(k2), optional residual."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], dtype=self.dtype, name="cv1")(x, train=train)
        y = Conv(self.c2, self.k[1], g=self.g, dtype=self.dtype, name="cv2")(
            y, train=train
        )
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    bott_k: tuple[int, int] = (1, 3)
    bott_e: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, dtype=self.dtype, name="cv1")(x, train=train)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, self.g, self.bott_k, self.bott_e,
                dtype=self.dtype, name=f"m{i}",
            )(a, train=train)
        b = Conv(c_, 1, dtype=self.dtype, name="cv2")(x, train=train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train=train
        )


class C3k(nn.Module):
    """C3 with k=3 bottlenecks (reference ``C3k``)."""

    c2: int
    n: int = 2
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return C3(
            self.c2, self.n, self.shortcut, self.g, self.e,
            bott_k=(3, 3), bott_e=1.0, dtype=self.dtype, name="c3",
        )(x, train=train)


class C3k2(nn.Module):
    """C2f-style split block whose inner modules are C3k or Bottleneck."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train=train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                nxt = C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")(
                    parts[-1], train=train
                )
            else:
                nxt = Bottleneck(
                    c, self.shortcut, self.g, (3, 3), 0.5, dtype=self.dtype, name=f"m{i}"
                )(parts[-1], train=train)
            parts.append(nxt)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train=train
        )


class C2f(nn.Module):
    """CSP split block with full-width bottlenecks (reference ``C2f``,
    ``block.py:225`` — bottleneck e=1.0, k=(3,3)); the v8-family workhorse."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train=train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(
                    c, self.shortcut, self.g, (3, 3), 1.0,
                    dtype=self.dtype, name=f"m{i}",
                )(parts[-1], train=train)
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train=train
        )


class AAttn(nn.Module):
    """Area attention: full attention within contiguous row-major token areas.

    Math parity with reference ``AAttn`` (``block.py:1181-1262``): 1x1 convs
    produce qk and v, a 5x5 depthwise conv on v adds positional encoding,
    tokens are split into ``area`` groups along the flattened H*W axis, and
    softmax(q k^T / sqrt(d)) v runs per group. On TPU this is a batched
    (B*area, N/area) matmul the XLA/MXU handles natively — the flash-attn
    kernel dependency disappears.
    """

    dim: int
    num_heads: int
    area: int = 1
    impl: str = "einsum"  # 'einsum' | 'dpa' (jax.nn.dot_product_attention)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        qk = Conv(self.dim * 2, 1, act=False, dtype=self.dtype, name="qk")(
            x, train=train
        )
        v = Conv(self.dim, 1, act=False, dtype=self.dtype, name="v")(x, train=train)
        pe = Conv(self.dim, 5, 1, 2, g=self.dim, act=False, dtype=self.dtype, name="pe")(
            v, train=train
        )

        n = H * W
        area = self.area if self.area > 0 else 1
        na = n // area
        qk_t = qk.reshape(B * area, na, 2 * self.dim)
        v_t = v.reshape(B * area, na, self.dim)
        q, k = qk_t[..., : self.dim], qk_t[..., self.dim :]

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, hd)

        # fused Pallas area attention: softmax(QK^T)V per head entirely in
        # VMEM, consuming the head-packed (G, N, C) layout directly — the
        # einsum path materializes (G*H, N, N) f32 scores in HBM and is the
        # forward's single largest cost at detector shapes (PERFORMANCE.md
        # per-node profile: node 6 = 13.1 ms, mostly attention traffic).
        # N needs 16-alignment and an N^2 f32 score tile that fits VMEM;
        # TPU backend only ('flash_interpret' runs the same kernels in
        # Pallas interpret mode on CPU — an explicit module attribute, not
        # a mutable global read at trace time). The path goes through the
        # custom-vjp wrapper, so differentiating an eval-mode apply (e.g.
        # distillation) hits the flash backward kernel instead of a Pallas
        # AD error. 'flash_train' additionally keeps the kernels in the
        # train graph (kernel fwd + VMEM flash bwd); plain 'flash' trains
        # with einsum, the round-2 default.
        import sys

        import kuzu.ops.flash_attention  # noqa: F401  (module, not the
        # re-exported function of the same name in kuzu.ops)
        _fa = sys.modules["kuzu.ops.flash_attention"]

        interp = self.impl == "flash_interpret"
        flash_ok = (
            (not train or self.impl == "flash_train")
            and na % 16 == 0
            and na * na * 4 <= 8 * 2**20
            and (jax.default_backend() == "tpu" or interp)
        )
        if self.impl in ("flash", "flash_train", "flash_interpret") and flash_ok:
            out = _fa.area_attention_trainable(
                q, k, v_t, self.num_heads, interp
            ).reshape(B, H, W, self.dim)
        elif self.impl == "dpa":
            qh, kh, vh = heads(q), heads(k), heads(v_t)
            out = jax.nn.dot_product_attention(qh, kh, vh).reshape(
                B, H, W, self.dim
            )
        else:  # einsum (also the train-time path under impl='flash')
            qh, kh, vh = heads(q), heads(k), heads(v_t)
            attn = jnp.einsum(
                "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
            out = jnp.einsum(
                "bhqk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32
            ).astype(x.dtype)
            out = out.reshape(B, H, W, self.dim)
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(
            out + pe, train=train
        )


class ABlock(nn.Module):
    """Area-attention block: x + attn(x); x + conv-MLP(x)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1
    attn_impl: str = "einsum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x + AAttn(
            self.dim, self.num_heads, self.area, impl=self.attn_impl,
            dtype=self.dtype, name="attn",
        )(x, train=train)
        h = int(self.dim * self.mlp_ratio)
        y = Conv(h, 1, dtype=self.dtype, name="mlp1")(x, train=train)
        y = Conv(self.dim, 1, act=False, dtype=self.dtype, name="mlp2")(y, train=train)
        return x + y


class A2C2f(nn.Module):
    """R-ELAN block: cv1 -> n stages (2x ABlock or C3k) -> concat -> cv2,
    optional layer-scale residual (gamma init 0.01)."""

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    attn_impl: str = "einsum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        num_heads = max(c_ // 32, 1)
        y = [Conv(c_, 1, dtype=self.dtype, name="cv1")(x, train=train)]
        for i in range(self.n):
            if self.a2:
                t = ABlock(
                    c_, num_heads, self.mlp_ratio, self.area,
                    attn_impl=self.attn_impl, dtype=self.dtype, name=f"m{i}_0",
                )(y[-1], train=train)
                t = ABlock(
                    c_, num_heads, self.mlp_ratio, self.area,
                    attn_impl=self.attn_impl, dtype=self.dtype, name=f"m{i}_1",
                )(t, train=train)
            else:
                t = C3k(c_, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")(
                    y[-1], train=train
                )
            y.append(t)
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(y, axis=-1), train=train
        )
        if self.a2 and self.residual:
            gamma = self.param(
                "gamma", nn.initializers.constant(0.01), (self.c2,)
            )
            return x + gamma.astype(out.dtype) * out
        return out


class SCDown(nn.Module):
    """Separable-conv downsample: 1x1 pointwise + k-s depthwise
    (reference ``SCDown``, the v10 stride block)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = Conv(self.c2, 1, dtype=self.dtype, name="cv1")(x, train=train)
        return Conv(
            self.c2, self.k, self.s, g=self.c2, act=False,
            dtype=self.dtype, name="cv2",
        )(y, train=train)


class RepVGGDW(nn.Module):
    """Parallel 7x7 + 3x3 depthwise convs, summed then SiLU (reference
    ``RepVGGDW``; the structural-reparam fuse is an inference-time identity
    we leave to the executor)."""

    ed: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = Conv(self.ed, 7, 1, 3, g=self.ed, act=False, dtype=self.dtype,
                 name="conv")(x, train=train)
        b = Conv(self.ed, 3, 1, 1, g=self.ed, act=False, dtype=self.dtype,
                 name="conv1")(x, train=train)
        return nn.silu(a + b)


class CIB(nn.Module):
    """Conditional identity block (reference ``CIB``): DW-PW-DW-PW-DW chain
    with optional RepVGGDW middle and residual."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c1, 3, g=c1, dtype=self.dtype, name="dw1")(x, train=train)
        y = Conv(2 * c_, 1, dtype=self.dtype, name="pw1")(y, train=train)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="rep")(y, train=train)
        else:
            y = Conv(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="dw2")(
                y, train=train
            )
        y = Conv(self.c2, 1, dtype=self.dtype, name="pw2")(y, train=train)
        y = Conv(self.c2, 3, g=self.c2, dtype=self.dtype, name="dw3")(
            y, train=train
        )
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(nn.Module):
    """C2f with CIB inner blocks (reference ``C2fCIB``)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train=train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                CIB(c, self.shortcut, e=1.0, lk=self.lk,
                    dtype=self.dtype, name=f"m{i}")(parts[-1], train=train)
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(parts, axis=-1), train=train
        )


class Attention(nn.Module):
    """PSA multi-head attention over flattened H*W tokens (reference
    ``Attention``, ``block.py:868-923``): 1x1 qkv conv with reduced key dim
    (attn_ratio * head_dim), 3x3 depthwise positional conv on v, 1x1 proj.
    NHWC + batched einsum so XLA maps the token matmuls onto the MXU."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        kd = int(hd * self.attn_ratio)
        h = self.dim + 2 * kd * self.num_heads
        qkv = Conv(h, 1, act=False, dtype=self.dtype, name="qkv")(x, train=train)
        t = qkv.reshape(B, H * W, self.num_heads, 2 * kd + hd)
        q, k, v = t[..., :kd], t[..., kd : 2 * kd], t[..., 2 * kd :]
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (kd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(B, H, W, self.dim)
        pe = Conv(
            self.dim, 3, 1, 1, g=self.dim, act=False, dtype=self.dtype, name="pe"
        )(v.reshape(B, H, W, self.dim), train=train)
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(
            out + pe, train=train
        )


class PSABlock(nn.Module):
    """Position-sensitive attention block (reference ``PSABlock``,
    ``block.py:924-959``): residual attention + residual conv-FFN."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = Attention(
            self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn"
        )(x, train=train)
        x = x + a if self.shortcut else a
        y = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn1")(x, train=train)
        y = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn2")(y, train=train)
        return x + y if self.shortcut else y


class C2PSA(nn.Module):
    """CSP block whose inner modules are PSABlocks (reference ``C2PSA``,
    ``block.py:1004-1047``) — the YOLO11 backbone attention stage."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train=train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(
                c, 0.5, max(c // 64, 1), dtype=self.dtype, name=f"m{i}"
            )(b, train=train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train=train
        )


class RepConv(nn.Module):
    """Structural-reparam conv (reference ``RepConv``, ``conv.py``): parallel
    3x3 + 1x1 convs (each with BN), summed, SiLU. The deploy-time fuse into
    one 3x3 is an inference identity left to the executor."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = Conv(self.c2, 3, 1, 1, act=False, dtype=self.dtype, name="conv1")(
            x, train=train
        )
        b = Conv(self.c2, 1, 1, 0, act=False, dtype=self.dtype, name="conv2")(
            x, train=train
        )
        return nn.silu(a + b)


class RepBottleneck(nn.Module):
    """Bottleneck with a RepConv first conv (reference ``RepBottleneck``)."""

    c2: int
    shortcut: bool = True
    e: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        y = RepConv(c_, dtype=self.dtype, name="cv1")(x, train=train)
        y = Conv(self.c2, 3, dtype=self.dtype, name="cv2")(y, train=train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class RepCSP(nn.Module):
    """C3 with RepBottleneck inner blocks (reference ``RepCSP``)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, dtype=self.dtype, name="cv1")(x, train=train)
        for i in range(self.n):
            a = RepBottleneck(
                c_, self.shortcut, e=1.0, dtype=self.dtype, name=f"m{i}"
            )(a, train=train)
        b = Conv(c_, 1, dtype=self.dtype, name="cv2")(x, train=train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train=train
        )


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN stage (reference ``RepNCSPELAN4``, the v9 workhorse):
    cv1 split, two chained RepCSP+Conv branches, 1x1 merge."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = Conv(self.c3, 1, dtype=self.dtype, name="cv1")(x, train=train)
        half = self.c3 // 2
        parts = [y[..., :half], y[..., half:]]
        t = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv2_csp")(
            parts[-1], train=train
        )
        t = Conv(self.c4, 3, dtype=self.dtype, name="cv2_conv")(t, train=train)
        parts.append(t)
        t = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv3_csp")(
            t, train=train
        )
        t = Conv(self.c4, 3, dtype=self.dtype, name="cv3_conv")(t, train=train)
        parts.append(t)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv4")(
            jnp.concatenate(parts, axis=-1), train=train
        )


class ADown(nn.Module):
    """v9 downsample (reference ``ADown``): 2x2/stride-1 avg pool, channel
    split, strided 3x3 conv on one half, maxpool+1x1 on the other."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        c1 = x.shape[-1]
        half = self.c2 // 2
        x1, x2 = x[..., : c1 // 2], x[..., c1 // 2 :]
        x1 = Conv(half, 3, 2, 1, dtype=self.dtype, name="cv1")(x1, train=train)
        x2 = nn.max_pool(
            x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        x2 = Conv(half, 1, 1, 0, dtype=self.dtype, name="cv2")(x2, train=train)
        return jnp.concatenate([x1, x2], axis=-1)


class SPPELAN(nn.Module):
    """SPP-ELAN (reference ``SPPELAN``): 1x1 + three chained k5 maxpools,
    concat, 1x1 merge."""

    c2: int
    c3: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.k // 2
        y = [Conv(self.c3, 1, dtype=self.dtype, name="cv1")(x, train=train)]
        for _ in range(3):
            y.append(
                nn.max_pool(
                    y[-1], (self.k, self.k), strides=(1, 1),
                    padding=[(p, p), (p, p)],
                )
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv5")(
            jnp.concatenate(y, axis=-1), train=train
        )


class PSA(nn.Module):
    """Position-sensitive attention stage (reference ``PSA``): cv1 split,
    one residual Attention + residual conv-FFN on the second half, cv2."""

    c2: int
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, dtype=self.dtype, name="cv1")(x, train=train)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(
            c, max(c // 64, 1), 0.5, dtype=self.dtype, name="attn"
        )(b, train=train)
        f = Conv(c * 2, 1, dtype=self.dtype, name="ffn1")(b, train=train)
        f = Conv(c, 1, act=False, dtype=self.dtype, name="ffn2")(f, train=train)
        b = b + f
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train=train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained k-size maxpools, concat."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, dtype=self.dtype, name="cv1")(x, train=train)
        pools = [y]
        p = self.k // 2
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1],
                    (self.k, self.k),
                    strides=(1, 1),
                    padding=[(p, p), (p, p)],
                )
            )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1), train=train
        )


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2x upsample (reference nn.Upsample scale=2 nearest)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def dfl_expectation(box_dist: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution Focal Loss decode: softmax-expectation over reg_max bins.

    The reference implements this as a frozen 1x1 conv (``DFL`` head.py);
    here it is a plain einsum the compiler fuses.
    box_dist: (..., 4*reg_max) -> (..., 4) expected distances.
    """
    shape = box_dist.shape[:-1]
    d = box_dist.reshape(*shape, 4, reg_max)
    p = jax.nn.softmax(d, axis=-1)
    bins = jnp.arange(reg_max, dtype=p.dtype)
    return (p * bins).sum(-1)


class Detect(nn.Module):
    """Anchor-free detect head: per-level box-dist (DFL) + class logits.

    Returns the per-level raw maps; decode happens in
    ``kuzu.models.yolo.detector`` so train/val share one forward.
    ``legacy=True`` uses the v8-style cls branch (two 3x3 Convs) instead of
    the v12 depthwise variant (reference ``head.py`` legacy switch).
    """

    nc: int
    ch: Sequence[int]  # input channels per level
    reg_max: int = 16
    legacy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: list[jnp.ndarray], train: bool = False
    ) -> list[jnp.ndarray]:
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            # box branch
            b = Conv(c2, 3, dtype=self.dtype, name=f"box{i}_0")(x, train=train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"box{i}_1")(b, train=train)
            b = nn.Conv(
                4 * self.reg_max,
                (1, 1),
                dtype=self.dtype,
                name=f"box{i}_2",
                bias_init=nn.initializers.constant(1.0),
            )(b)
            if self.legacy:  # v8-style cls branch
                c = Conv(c3, 3, dtype=self.dtype, name=f"cls{i}_0")(x, train=train)
                c = Conv(c3, 3, dtype=self.dtype, name=f"cls{i}_1")(c, train=train)
            else:  # v12: DW 3x3 + 1x1, twice
                c = DWConv(x.shape[-1], 3, dtype=self.dtype, name=f"cls{i}_0dw")(
                    x, train=train
                )
                c = Conv(c3, 1, dtype=self.dtype, name=f"cls{i}_0pw")(c, train=train)
                c = DWConv(c3, 3, dtype=self.dtype, name=f"cls{i}_1dw")(c, train=train)
                c = Conv(c3, 1, dtype=self.dtype, name=f"cls{i}_1pw")(c, train=train)
            c = nn.Conv(
                self.nc,
                (1, 1),
                dtype=self.dtype,
                name=f"cls{i}_2",
                bias_init=nn.initializers.constant(-4.6),  # ~log(0.01/0.99)
            )(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


class V10Detect(nn.Module):
    """Dual-head detect (reference ``v10Detect`` + ``Detect`` end2end,
    ``head.py``): structurally identical one2many and one2one branches —
    the v10 "light" cls head is exactly the non-legacy DW cls branch above.
    The one2one branch sees stop-gradient features (the reference detaches
    them in ``forward_end2end``) so only one2many trains the backbone;
    inference consumes one2one with NMS-free top-k selection
    (``kuzu.ops.nms.nms_free_select``)."""

    nc: int
    ch: Sequence[int]
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: list[jnp.ndarray], train: bool = False
    ) -> dict[str, list[jnp.ndarray]]:
        o2m = Detect(
            self.nc, self.ch, self.reg_max, legacy=False,
            dtype=self.dtype, name="one2many",
        )(feats, train=train)
        detached = [jax.lax.stop_gradient(f) for f in feats]
        o2o = Detect(
            self.nc, self.ch, self.reg_max, legacy=False,
            dtype=self.dtype, name="one2one",
        )(detached, train=train)
        return {"one2many": o2m, "one2one": o2o}


class Proto(nn.Module):
    """Mask prototype head (reference ``block.py:78`` Proto): Conv 3x3 ->
    2x upsample -> Conv 3x3 -> 1x1 to ``nm`` prototype channels. Consumes
    the P3 map, emits stride-4 prototypes."""

    npr: int = 256
    nm: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv(self.npr, 3, dtype=self.dtype, name="cv1")(x, train=train)
        x = upsample2x(x)
        x = Conv(self.npr, 3, dtype=self.dtype, name="cv2")(x, train=train)
        return Conv(self.nm, 1, dtype=self.dtype, name="cv3")(x, train=train)


class Segment(nn.Module):
    """Instance-segmentation head (reference ``head.py:175`` Segment):
    the Detect head plus per-level mask-coefficient branches (cv4) and the
    shared Proto module over the P3 input.

    Returns ``{"det": [per-level maps], "coeffs": (B, A, nm),
    "protos": (B, Hp, Wp, nm)}`` — decode/NMS consume ``det`` exactly like
    a detector; mask composition is sigmoid(coeffs @ protos) per kept box.
    """

    nc: int
    ch: Sequence[int]
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    legacy: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray], train: bool = False) -> dict:
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(
            feats[0], train=train
        )
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = []
        for i, x in enumerate(feats):
            m = Conv(c4, 3, dtype=self.dtype, name=f"m{i}_0")(x, train=train)
            m = Conv(c4, 3, dtype=self.dtype, name=f"m{i}_1")(m, train=train)
            m = nn.Conv(self.nm, (1, 1), dtype=self.dtype, name=f"m{i}_2")(m)
            coeffs.append(m.reshape(m.shape[0], -1, self.nm))
        det = Detect(
            self.nc, self.ch, self.reg_max, legacy=self.legacy,
            dtype=self.dtype, name="detect",
        )(feats, train=train)
        return {
            "det": det,
            "coeffs": jnp.concatenate(coeffs, axis=1).astype(jnp.float32),
            "protos": protos.astype(jnp.float32),
        }


class Pose(nn.Module):
    """Keypoint head (reference ``head.py:230`` Pose): Detect plus per-level
    keypoint branches predicting ``kpt_shape = (K, D)`` values per anchor
    (D=3: x, y, visibility logit). Returns ``{"det": [...], "kpts_raw":
    (B, A, K, D)}``; decode (anchor-relative xy*2 + anchor - 0.5, reference
    ``v8PoseLoss.kpts_decode``) happens in the loss/predictor so train and
    inference share one forward."""

    nc: int
    ch: Sequence[int]
    kpt_shape: tuple[int, int] = (17, 3)
    reg_max: int = 16
    legacy: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray], train: bool = False) -> dict:
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpts = []
        for i, x in enumerate(feats):
            m = Conv(c4, 3, dtype=self.dtype, name=f"k{i}_0")(x, train=train)
            m = Conv(c4, 3, dtype=self.dtype, name=f"k{i}_1")(m, train=train)
            m = nn.Conv(nk, (1, 1), dtype=self.dtype, name=f"k{i}_2")(m)
            kpts.append(m.reshape(m.shape[0], -1, nk))
        det = Detect(
            self.nc, self.ch, self.reg_max, legacy=self.legacy,
            dtype=self.dtype, name="detect",
        )(feats, train=train)
        raw = jnp.concatenate(kpts, axis=1).astype(jnp.float32)
        return {
            "det": det,
            "kpts_raw": raw.reshape(raw.shape[0], raw.shape[1], *self.kpt_shape),
        }


def kpts_decode(
    anchor_points: jnp.ndarray, kpts_raw: jnp.ndarray
) -> jnp.ndarray:
    """Anchor-relative keypoint decode in grid units (reference
    ``v8PoseLoss.kpts_decode``): xy*2 + anchor - 0.5; extra dims pass
    through (visibility logits)."""
    xy = kpts_raw[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    return jnp.concatenate([xy, kpts_raw[..., 2:]], axis=-1)


class OBB(nn.Module):
    """Oriented-detection head (reference ``head.py:200`` OBB): Detect plus
    per-level angle branches; theta = (sigmoid - 0.25) * pi in
    [-pi/4, 3pi/4]. Returns ``{"det": [...], "angle": (B, A, ne)}``."""

    nc: int
    ch: Sequence[int]
    ne: int = 1
    reg_max: int = 16
    legacy: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray], train: bool = False) -> dict:
        c4 = max(self.ch[0] // 4, self.ne)
        angles = []
        for i, x in enumerate(feats):
            m = Conv(c4, 3, dtype=self.dtype, name=f"a{i}_0")(x, train=train)
            m = Conv(c4, 3, dtype=self.dtype, name=f"a{i}_1")(m, train=train)
            m = nn.Conv(self.ne, (1, 1), dtype=self.dtype, name=f"a{i}_2")(m)
            angles.append(m.reshape(m.shape[0], -1, self.ne))
        det = Detect(
            self.nc, self.ch, self.reg_max, legacy=self.legacy,
            dtype=self.dtype, name="detect",
        )(feats, train=train)
        raw = jnp.concatenate(angles, axis=1).astype(jnp.float32)
        angle = (jax.nn.sigmoid(raw) - 0.25) * math.pi
        return {"det": det, "angle": angle}


class Classify(nn.Module):
    """Classification head (reference ``head.py:282`` Classify): 1x1 Conv to
    1280 channels, global average pool, linear to ``c2`` logits."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv(1280, 1, dtype=self.dtype, name="conv")(x, train=train)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.c2, dtype=jnp.float32, name="linear")(x)
