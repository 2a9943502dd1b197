"""CSA-ViT: ViT with structure + context modules, CTC or AR decoding.

Capability parity with the reference research model
(``src/models/character_detection/csa_vit_model.py``):
- per-layer optional *structure module* (``:43-76``): local structure over
  the 2D patch grid — 'cnn' mode is a depthwise 3x3 conv; 'graph' mode is
  4-connected neighbor message passing (the PyG ``GATConv`` path rebuilt as
  a dense gather over the static grid — TPU-friendly, no sparse ops);
- per-layer optional *context module* (``CSAViTLayer :78``): cross-attention
  from patch tokens to a pooled global-context token set;
- encoder with gradient checkpointing (``:441-477`` -> ``nn.remat``);
- heads: CTC per-column logits (``:575, :828``) or an AR transformer decoder
  (``:928`` greedy / ``:1005`` beam — reuse ``kuzu.models.trocr`` decoding).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from kuzu.models.layers import (
    EncoderBlock,
    Mlp,
    MultiHeadAttention,
    PatchEmbed,
    sincos_2d_pos_embed,
)


class StructureModule(nn.Module):
    """Local structure over the (gh, gw) patch grid."""

    mode: str = "cnn"  # 'cnn' | 'graph'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        b, t, c = tokens.shape
        x = tokens.reshape(b, gh, gw, c)
        if self.mode == "cnn":
            y = nn.Conv(
                c, (3, 3), padding="SAME", feature_group_count=c,
                dtype=self.dtype, name="dw",
            )(x)
            y = nn.gelu(y)
            y = nn.Conv(c, (1, 1), dtype=self.dtype, name="pw")(y)
        else:  # 4-connected neighbor aggregation with learned gating
            up = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
            down = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
            left = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
            right = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
            neigh = jnp.stack([up, down, left, right], axis=-2)  # (B,H,W,4,C)
            q = nn.Dense(c, dtype=self.dtype, name="gate_q")(x)
            k = nn.Dense(c, dtype=self.dtype, name="gate_k")(neigh)
            att = nn.softmax(
                (q[..., None, :] * k).sum(-1) / jnp.sqrt(c).astype(jnp.float32),
                axis=-1,
            )
            y = (att[..., None] * nn.Dense(c, dtype=self.dtype, name="gate_v")(neigh)).sum(-2)
        return tokens + y.reshape(b, t, c)


class CSAViTLayer(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    structure: Optional[str] = None  # None | 'cnn' | 'graph'
    context: bool = False
    n_context: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, gh: int, gw: int, train: bool = False
    ) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.num_heads, self.dropout, self.dtype, name="attn"
        )(y, deterministic=not train)
        if self.structure:
            x = StructureModule(self.structure, dtype=self.dtype, name="structure")(
                x, gh, gw
            )
        if self.context:
            # pooled context tokens: strided mean over the sequence
            b, t, c = x.shape
            step = max(t // self.n_context, 1)
            ctx = x[:, : step * self.n_context].reshape(b, self.n_context, step, c).mean(2)
            y = nn.LayerNorm(dtype=self.dtype, name="norm_ctx")(x)
            x = x + MultiHeadAttention(
                self.num_heads, self.dropout, self.dtype, name="context_attn"
            )(y, kv=ctx, deterministic=not train)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            int(x.shape[-1] * self.mlp_ratio), dropout=self.dropout,
            dtype=self.dtype, name="mlp",
        )(y, deterministic=not train)
        return x


class CSAViTEncoder(nn.Module):
    image_size: tuple[int, int] = (1024, 64)
    patch_size: tuple[int, int] = (16, 16)
    dim: int = 256
    depth: int = 6
    num_heads: int = 8
    structure: Optional[str] = "cnn"
    structure_layers: tuple[int, ...] = (0, 2, 4)  # which layers get structure
    context_layers: tuple[int, ...] = (1, 3, 5)
    dropout: float = 0.0
    grad_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        gh = self.image_size[0] // self.patch_size[0]
        gw = self.image_size[1] // self.patch_size[1]
        x = PatchEmbed(self.dim, self.patch_size, dtype=self.dtype)(images)
        x = x + jnp.asarray(sincos_2d_pos_embed(self.dim, gh, gw), x.dtype)[None]
        layer_cls = CSAViTLayer
        if self.grad_checkpoint:
            layer_cls = nn.remat(CSAViTLayer, static_argnums=(2, 3, 4))
        for i in range(self.depth):
            x = layer_cls(
                self.num_heads,
                structure=self.structure if i in self.structure_layers else None,
                context=i in self.context_layers,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, gh, gw, train)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class CSAViT(nn.Module):
    """Encoder + head: 'ctc' (per-row logits) or 'ar' (transformer decoder)."""

    vocab_size: int
    head: str = "ctc"  # 'ctc' | 'ar'
    image_size: tuple[int, int] = (1024, 64)
    patch_size: tuple[int, int] = (16, 16)
    dim: int = 256
    depth: int = 6
    num_heads: int = 8
    structure: Optional[str] = "cnn"
    max_len: int = 128
    dec_depth: int = 4
    grad_checkpoint: bool = False
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.encoder = CSAViTEncoder(
            self.image_size,
            self.patch_size,
            self.dim,
            self.depth,
            self.num_heads,
            structure=self.structure,
            grad_checkpoint=self.grad_checkpoint,
            dtype=self.dtype,
        )
        if self.head == "ctc":
            self.ctc_head = nn.Dense(self.vocab_size, dtype=jnp.float32)
        else:
            from kuzu.models.trocr import ARDecoder

            self.decoder = ARDecoder(
                self.vocab_size,
                self.max_len,
                self.dim,
                self.dec_depth,
                self.num_heads,
                dtype=self.dtype,
            )

    def encode(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder(images, train=train)

    def __call__(
        self,
        images: jnp.ndarray,
        tokens: jnp.ndarray | None = None,
        train: bool = False,
    ) -> jnp.ndarray:
        mem = self.encode(images, train=train)
        if self.head == "ctc":
            # collapse the width axis of the patch grid -> per-row timesteps
            gh = self.image_size[0] // self.patch_size[0]
            gw = self.image_size[1] // self.patch_size[1]
            b = mem.shape[0]
            rows = mem.reshape(b, gh, gw, self.dim).mean(axis=2)
            return self.ctc_head(rows)  # (B, gh, vocab)
        assert tokens is not None, "AR head needs teacher-forcing tokens"
        return self.decoder(tokens, mem, train=train)
