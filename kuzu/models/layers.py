"""Shared flax.linen building blocks for all kuzu model families.

Transformer pieces (attention with optional KV cache, MLP, encoder block,
2D sin-cos position embeddings for non-square grids) serve the TrOCR/ViT/LM
families; Conv blocks serve the YOLO family. Everything is bf16-friendly:
params live in fp32, compute dtype is a module arg, matmuls carry
``preferred_element_type`` so the MXU accumulates in fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def sincos_2d_pos_embed(dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """2D sin-cos position embedding for a (grid_h, grid_w) patch grid.

    Same construction as the reference TrOCR encoder's non-square embedding
    (``src/models/trocr_model.py:11-58``): half the channels encode the y
    coordinate, half the x, each as interleaved sin/cos over log-spaced
    frequencies. Returns (grid_h*grid_w, dim) float32.
    """
    assert dim % 4 == 0, "sincos 2D embed needs dim % 4 == 0"
    quarter = dim // 4

    def axis_embed(positions: np.ndarray) -> np.ndarray:
        omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
        out = np.einsum("p,f->pf", positions.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (P, dim/2)

    gy, gx = np.meshgrid(
        np.arange(grid_h, dtype=np.float32),
        np.arange(grid_w, dtype=np.float32),
        indexing="ij",
    )
    emb = np.concatenate(
        [axis_embed(gy.reshape(-1)), axis_embed(gx.reshape(-1))], axis=1
    )
    return emb.astype(np.float32)  # (H*W, dim)


class PatchEmbed(nn.Module):
    """Conv patchifier: (B, H, W, C) -> (B, H/p * W/p, dim)."""

    dim: int
    patch_size: tuple[int, int] = (16, 16)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.dim,
            kernel_size=self.patch_size,
            strides=self.patch_size,
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = nn.gelu
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class MultiHeadAttention(nn.Module):
    """MHA with optional cross-attention input and decode-time KV cache.

    The KV cache uses flax's ``cache`` collection with a static ``max_len``;
    during AR decoding each call writes the current step's K/V at
    ``cache_index`` — fixed shapes throughout, as required under jit.
    """

    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_cache: bool = False
    max_len: int = 0
    # 'einsum' | 'flash' (kernel at eval, einsum in train) | 'flash_train'
    # (Pallas kernel + VMEM flash VJP in both modes) | 'flash_interpret'
    # (same kernels, Pallas interpret mode — CPU tests). Kernel path only
    # for unmasked, uncached self-attention (the ViT encoder); masked /
    # cached / cross attention always takes the einsum path.
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, Tq, D) queries
        kv: Optional[jnp.ndarray] = None,  # (B, Tk, D) or None for self-attn
        mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, h, Tq, Tk)
        deterministic: bool = True,
        decode_step: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        d = x.shape[-1]
        h = self.num_heads
        head_dim = d // h
        kv_in = x if kv is None else kv

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], h, head_dim)

        qf = nn.Dense(d, dtype=self.dtype, name="q")(x)
        kf = nn.Dense(d, dtype=self.dtype, name="k")(kv_in)
        vf = nn.Dense(d, dtype=self.dtype, name="v")(kv_in)

        interp = self.attn_impl == "flash_interpret"
        n = x.shape[1]
        flash_ok = (
            self.attn_impl in ("flash", "flash_train", "flash_interpret")
            and kv is None
            and mask is None
            and decode_step is None
            and not self.use_cache
            and (deterministic or self.attn_impl in ("flash_train", "flash_interpret"))
            and (self.dropout == 0.0 or deterministic)
            and n % 16 == 0
            and n * n * 4 <= 8 * 2**20
            and (jax.default_backend() == "tpu" or interp)
        )
        if flash_ok:
            # head-packed (B, T, C) is the kernel's native layout; the
            # custom-vjp wrapper keeps training differentiable (VMEM flash
            # backward, ops/flash_attention.py::area_attention_bwd)
            from kuzu.ops.flash_attention import area_attention_trainable

            out = area_attention_trainable(qf, kf, vf, h, interp)
            return nn.Dense(d, dtype=self.dtype, name="out")(out)

        q, k, v = split(qf), split(kf), split(vf)

        if self.use_cache and decode_step is not None:
            # self-attention decode: append this step's k/v into the cache
            cache_k = self.variable(
                "cache",
                "cached_k",
                lambda: jnp.zeros((x.shape[0], self.max_len, h, head_dim), self.dtype),
            )
            cache_v = self.variable(
                "cache",
                "cached_v",
                lambda: jnp.zeros((x.shape[0], self.max_len, h, head_dim), self.dtype),
            )
            k_all = jax.lax.dynamic_update_slice(
                cache_k.value, k.astype(self.dtype), (0, decode_step, 0, 0)
            )
            v_all = jax.lax.dynamic_update_slice(
                cache_v.value, v.astype(self.dtype), (0, decode_step, 0, 0)
            )
            cache_k.value = k_all
            cache_v.value = v_all
            k, v = k_all, v_all
            # causal mask over cache positions
            pos = jnp.arange(self.max_len)
            mask = (pos[None, None, None, :] <= decode_step).astype(bool)

        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(head_dim).astype(jnp.float32)
        if mask is not None:
            attn = jnp.where(mask, attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        out = out.reshape(x.shape[0], x.shape[1], d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


class EncoderBlock(nn.Module):
    """Pre-norm transformer encoder block."""

    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.num_heads, self.dropout, self.dtype,
            attn_impl=self.attn_impl, name="attn",
        )(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            int(x.shape[-1] * self.mlp_ratio),
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


class DecoderBlock(nn.Module):
    """Pre-norm transformer decoder block: causal self-attn + cross-attn."""

    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_cache: bool = False
    max_len: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray,
        self_mask: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode_step: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.num_heads,
            self.dropout,
            self.dtype,
            use_cache=self.use_cache,
            max_len=self.max_len,
            name="self_attn",
        )(y, mask=self_mask, deterministic=deterministic, decode_step=decode_step)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + MultiHeadAttention(
            self.num_heads, self.dropout, self.dtype, name="cross_attn"
        )(y, kv=memory, mask=memory_mask, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + Mlp(
            int(x.shape[-1] * self.mlp_ratio),
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


def causal_mask(length: int) -> jnp.ndarray:
    """(1, 1, T, T) lower-triangular bool mask."""
    m = jnp.tril(jnp.ones((length, length), bool))
    return m[None, None]


class ConvBN(nn.Module):
    """Conv + BatchNorm + SiLU — the YOLO ``Conv`` block equivalent.

    BatchNorm statistics live in the ``batch_stats`` collection; axis_name
    ``data`` makes cross-device stat sync explicit under the mesh.
    """

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
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
