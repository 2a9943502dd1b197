"""Character-level masked language model (RoBERTa-style, flax).

Capability parity with the reference LM pretraining stack
(``train_language_model.py`` — HF ``AutoModelForMaskedLM`` with a one-char
tokenizer, and ``train_language_model_scratch.py`` — fresh ``RobertaConfig``):
a transformer encoder over char tokens with learned positions, an MLM head,
and fully in-graph masking (the reference's ``RoBERTaDataCollator`` 15%
dynamic masking happens here on-device from the step rng, so the input
pipeline ships plain token ids).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from kuzu.models.layers import EncoderBlock


class CharMLM(nn.Module):
    vocab_size: int
    max_len: int = 256
    dim: int = 256
    depth: int = 6
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # (B, T) int32
        attention_mask: jnp.ndarray | None = None,  # (B, T) 1=real
        train: bool = False,
    ) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype, name="embed")(tokens)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (self.max_len, self.dim)
        )
        x = x + pos[None, : tokens.shape[1]].astype(x.dtype)
        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :].astype(bool)
        for i in range(self.depth):
            # EncoderBlock has no mask arg; fold padding into attention by
            # masking via a large negative bias through a wrapped block
            x = _MaskedEncoderBlock(
                self.num_heads, self.mlp_ratio, self.dropout, self.dtype,
                name=f"block{i}",
            )(x, mask, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="head_transform")(x)
        x = nn.gelu(x)
        x = nn.LayerNorm(dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.vocab_size, dtype=jnp.float32, name="lm_head")(x)


class _MaskedEncoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        from kuzu.models.layers import Mlp, MultiHeadAttention

        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.num_heads, self.dropout, self.dtype, name="attn"
        )(y, mask=mask, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            int(x.shape[-1] * self.mlp_ratio),
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


def apply_mlm_masking(
    tokens: jnp.ndarray,  # (B, T)
    rng: jax.Array,
    mask_id: int,
    vocab_size: int,
    special_until: int = 5,  # ids < this are never masked
    mlm_prob: float = 0.15,
    pad_id: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """BERT-style dynamic masking in-graph.

    Returns (masked_tokens, labels) where labels = original id at masked
    positions, -100 elsewhere (reference collator convention).
    80% -> [MASK], 10% -> random char, 10% -> unchanged.
    """
    r_select, r_kind, r_rand = jax.random.split(rng, 3)
    maskable = tokens >= special_until
    sel = (jax.random.uniform(r_select, tokens.shape) < mlm_prob) & maskable
    kind = jax.random.uniform(r_kind, tokens.shape)
    rand_tok = jax.random.randint(
        r_rand, tokens.shape, special_until, vocab_size
    ).astype(tokens.dtype)
    masked = jnp.where(
        sel & (kind < 0.8),
        jnp.asarray(mask_id, tokens.dtype),
        jnp.where(sel & (kind >= 0.9), rand_tok, tokens),
    )
    labels = jnp.where(sel, tokens, -100)
    return masked, labels
