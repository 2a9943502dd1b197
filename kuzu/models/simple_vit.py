"""SimpleViT single-glyph classifier.

The rebuild's "minimum end-to-end slice" model (BASELINE config 1,
reference ``scripts/train_simplevit_char.py`` — 128x128 single-channel glyph
crops, one class per unicode codepoint). A compact ViT with 2D sin-cos
position embeddings and global-average-pool head (the SimpleViT recipe), in
bf16-friendly flax.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from kuzu.models.layers import EncoderBlock, PatchEmbed, sincos_2d_pos_embed


class SimpleViT(nn.Module):
    num_classes: int
    image_size: tuple[int, int] = (128, 128)
    patch_size: tuple[int, int] = (16, 16)
    dim: int = 256
    depth: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images: (B, H, W, C) in [0, 1] (or raw uint8) -> logits (B, num_classes)."""
        from kuzu.ops.images import from_uint8

        images = from_uint8(images)
        gh = self.image_size[0] // self.patch_size[0]
        gw = self.image_size[1] // self.patch_size[1]
        x = PatchEmbed(self.dim, self.patch_size, dtype=self.dtype)(images)
        pos = sincos_2d_pos_embed(self.dim, gh, gw)
        x = x + jnp.asarray(pos, x.dtype)[None]
        for i in range(self.depth):
            x = EncoderBlock(
                self.num_heads,
                self.mlp_ratio,
                self.dropout,
                self.dtype,
                name=f"block{i}",
            )(x, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = x.mean(axis=1)  # global average pool
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)
