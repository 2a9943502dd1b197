"""TinyViT-lite: the MobileSAM image encoder, TPU-native.

Capability parity with the reference MobileSAM encoder
(``yolov12/ultralytics/models/sam/modules/tiny_encoder.py`` ``TinyViT``,
built by ``sam/build.py:56-63`` ``build_mobile_sam`` with dims
(64, 128, 160, 320), depths (2, 2, 6, 2), heads (2, 4, 5, 10)): a
conv/transformer hybrid — conv patch embed, an MBConv stage at stride 4,
then windowed-attention stages — that replaces the ViT-H image encoder at
~1% of its parameters while keeping the SAM decoder contract
(stride-16 feature map, prompt-decoder dim).

TPU-first re-anatomy (deliberate deviations, not a port):

- Window partition is a static reshape ``(B, H, W, D) -> (B*nW, w*w, D)``
  folding windows into the batch axis — the idiomatic SPMD/MXU layout; the
  reference pads to window multiples at runtime, here grids are required
  to tile evenly (they do for every kuzu image size: 256/8=32, /16=16).
- The reference's learned per-offset attention biases (``Attention.
  attention_biases``, a gather per forward) are dropped; locality comes
  from the depthwise ``local_conv`` each block already carries and the
  window partition itself. Gathers stall the VPU; the depthwise conv is a
  fused lane-wise op.
- BatchNorm (``Conv2d_BN``) becomes LayerNorm so the encoder is stateless
  (no ``batch_stats`` plumbing through the SAM/SAM2 scan paths) — the same
  trade the kuzu ViT encoder makes.
- The reference's stage 3 downsamples to stride 32 and the SAM neck
  re-reads it as 64x64; here the last stage stays at stride 16 (the
  decoder's native grid) and the neck is one Dense lift to the prompt dim.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from kuzu.models.layers import Mlp, MultiHeadAttention


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, D) -> (B*nH*nW, w*w, D); H, W must tile by w."""
    b, h, wd, d = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // w) * (wd // w), w * w, d)


def window_merge(x: jnp.ndarray, w: int, hw: tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`window_partition`."""
    h, wd = hw
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, wd, x.shape[-1])


class MBConv(nn.Module):
    """Inverted-bottleneck conv block (reference ``tiny_encoder.py:104``):
    1x1 expand -> 3x3 depthwise -> 1x1 project, GELU, residual."""

    dim: int
    expand: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = int(self.dim * self.expand)
        y = nn.Conv(h, (1, 1), use_bias=False, dtype=self.dtype, name="pw1")(x)
        y = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="n1")(y))
        y = nn.Conv(
            h, (3, 3), feature_group_count=h, use_bias=False,
            dtype=self.dtype, name="dw",
        )(y)
        y = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="n2")(y))
        y = nn.Conv(
            self.dim, (1, 1), use_bias=False, dtype=self.dtype, name="pw2"
        )(y)
        return nn.gelu(x + nn.LayerNorm(dtype=self.dtype, name="n3")(y))


class TinyBlock(nn.Module):
    """Windowed attention + depthwise local conv + MLP (reference
    ``TinyViTBlock``, ``tiny_encoder.py:492``)."""

    num_heads: int
    window: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, D)
        b, h, wd, d = x.shape
        w = min(self.window, h, wd)
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = window_partition(y, w)
        y = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="attn")(y)
        x = x + window_merge(y, w, (h, wd))
        # local conv (reference local_conv_size=3) restores cross-window flow
        x = x + nn.Conv(
            d, (3, 3), feature_group_count=d, dtype=self.dtype, name="local"
        )(nn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        return x + Mlp(
            int(d * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(y.reshape(b, h * wd, d)).reshape(b, h, wd, d)


class TinyViTEncoder(nn.Module):
    """MobileSAM-lite image encoder with the ``SAMImageEncoder`` contract:
    ``(B, S, S, 3) -> (B, (S/16)^2, dim)``."""

    img_size: int = 256
    dim: int = 256  # output (prompt/decoder) dim
    embed_dims: tuple = (64, 128, 160)  # stride-4 / -8 / -16 stage dims
    depths: tuple = (2, 2, 4)
    num_heads: tuple = (0, 4, 5)  # stage 0 is conv-only
    window: int = 8
    dtype: Any = jnp.float32
    attn_impl: str = "einsum"  # decoder-contract compat; windows stay einsum

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from kuzu.ops.images import from_uint8

        x = from_uint8(images)
        # patch embed: two stride-2 convs -> stride 4 (reference PatchEmbed)
        d0 = self.embed_dims[0]
        x = nn.Conv(d0 // 2, (3, 3), (2, 2), dtype=self.dtype, name="embed0")(x)
        x = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="embed_n0")(x))
        x = nn.Conv(d0, (3, 3), (2, 2), dtype=self.dtype, name="embed1")(x)
        x = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="embed_n1")(x))

        for si, (d, depth) in enumerate(zip(self.embed_dims, self.depths)):
            if si > 0:  # patch merging: stride-2 conv lift (PatchMerging)
                x = nn.Conv(
                    d, (3, 3), (2, 2), dtype=self.dtype, name=f"merge{si}"
                )(x)
                x = nn.gelu(
                    nn.LayerNorm(dtype=self.dtype, name=f"merge_n{si}")(x)
                )
            for bi in range(depth):
                if si == 0:
                    x = MBConv(d, dtype=self.dtype, name=f"s{si}b{bi}")(x)
                else:
                    x = TinyBlock(
                        self.num_heads[si], self.window,
                        dtype=self.dtype, name=f"s{si}b{bi}",
                    )(x)

        # neck: lift to the decoder dim at stride 16
        g = self.img_size // 16
        x = x.reshape(x.shape[0], g * g, x.shape[-1])
        x = nn.Dense(self.dim, dtype=self.dtype, name="neck")(x)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)
