"""UNet-Transformer encoder for one-line OCR.

Capability parity with the reference ``UNetTransformerEncoder``
(``src/models/unet_transformer_encoder.py:66-185``): ConvBlock stem, N
strided downsample stages, flatten to a token sequence, learned position
embedding (the reference lazily sizes it on first forward — here the token
count is static from image/patch geometry), a transformer encoder stack, and
a linear projection to the decoder width. Pairs with ``kuzu.models.trocr
.ARDecoder`` to form the ``LitOCRModel`` equivalent
(``src/models/ocr_lightning.py:10-142``) — selectable in the recognize task
via ``encoder=unet``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from kuzu.models.layers import EncoderBlock


class ConvGN(nn.Module):
    """Conv + GroupNorm + SiLU — state-free ConvBN stand-in so the encoder
    plugs into trainers without a mutable batch_stats collection."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.GroupNorm(
            num_groups=min(32, self.features), dtype=self.dtype, name="gn"
        )(x)
        return nn.silu(x)


class UNetTransformerEncoder(nn.Module):
    out_dim: int = 256
    base_channels: int = 64
    num_downsamples: int = 3
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, H, W, C) -> (B, T, out_dim) with T = H*W / 4^num_downsamples."""
        x = ConvGN(self.base_channels, kernel=3, dtype=self.dtype, name="stem")(
            images, train=train
        )
        ch = self.base_channels
        for i in range(self.num_downsamples):
            ch = min(ch * 2, 512)
            x = ConvGN(ch, kernel=3, stride=2, dtype=self.dtype, name=f"down{i}")(
                x, train=train
            )
            x = ConvGN(ch, kernel=3, dtype=self.dtype, name=f"conv{i}")(
                x, train=train
            )
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = nn.Dense(self.out_dim, dtype=self.dtype, name="token_proj")(tokens)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (h * w, self.out_dim)
        )
        tokens = tokens + pos[None].astype(tokens.dtype)
        for i in range(self.depth):
            tokens = EncoderBlock(
                self.num_heads, self.mlp_ratio, self.dropout, self.dtype,
                name=f"block{i}",
            )(tokens, deterministic=not train)
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm")(tokens)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")(tokens)
