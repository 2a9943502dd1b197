"""SAM2-lite: memory-conditioned (video) segmentation, TPU-native.

Capability parity with the reference SAM2 family
(``yolov12/ultralytics/models/sam/modules/sam.py:105`` ``SAM2Model``,
``modules/memory_attention.py`` ``MemoryAttention``/``MemoryAttentionLayer``,
``modules/encoders.py MemoryEncoder``, builders ``sam/build.py:68-108``,
``SAM2VideoPredictor`` in ``sam/predict.py``): prompt an object on the
first frame, then propagate its mask through the clip by conditioning each
frame's features on a memory bank of past frames' mask-fused features plus
object-pointer tokens.

TPU-first design (deliberate re-anatomy, not a port):

- The reference keeps a Python-dict memory bank and runs a per-frame torch
  inference loop (``predict.py`` inference state). Here the bank is a
  FIXED-SHAPE ring buffer (``(B, M, N, mem_dim)`` memories + ``(B, K, D)``
  object pointers with validity masks) carried through one
  ``jax.lax.scan`` over the frame axis — the whole clip tracks inside a
  single jit with static shapes; absent slots are validity-masked out of
  the cross-attention instead of absent (kuzu's fixed-shape + mask
  convention, docs/DESIGN.md).
- The reference's RoPE memory attention (``blocks.py RoPEAttention``)
  becomes additive sincos *temporal* embeddings on memory slots: XLA fuses
  the add into the attention matmuls, and frame recency — not 2D layout —
  is the signal that matters for a 4-deep ring.
- Multi-object tracking: the reference loops objects in Python
  (``predict.py`` per-object inference state); here objects ARE batch
  lanes — track B objects in one scan, the idiomatic SPMD axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kuzu.models.layers import Mlp, MultiHeadAttention, sincos_2d_pos_embed
from kuzu.models.sam import (
    PAD,
    MaskDecoder,
    PromptEncoder,
    SAMImageEncoder,
)


def sincos_1d(dim: int, pos: jnp.ndarray) -> jnp.ndarray:
    """Sincos embedding of (possibly traced) integer positions -> (..., dim)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / max(half - 1, 1))
    ang = pos[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class MemoryEncoder(nn.Module):
    """Fuse a frame's features with its predicted mask into a compact
    memory embedding (reference ``encoders.py MemoryEncoder``: mask
    downsampler + feature fuser -> 64-dim memory)."""

    mem_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feat: jnp.ndarray,  # (B, N, D) stride-16 features
        mask_logits: jnp.ndarray,  # (B, H4, W4) stride-4 mask logits
        grid_hw: tuple[int, int],
    ) -> jnp.ndarray:  # (B, N, mem_dim)
        hg, wg = grid_hw
        m = jax.nn.sigmoid(mask_logits)[..., None]  # (B, H4, W4, 1)
        # stride-4 mask -> stride-16 grid: two stride-2 convs
        for i, ch in enumerate((self.mem_dim // 2, self.mem_dim)):
            m = nn.Conv(
                ch, (3, 3), strides=(2, 2), dtype=self.dtype, name=f"down{i}"
            )(m)
            m = nn.gelu(nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(m))
        m = m.reshape(m.shape[0], hg * wg, self.mem_dim)
        f = nn.Dense(self.mem_dim, dtype=self.dtype, name="fuse")(feat)
        out = nn.Dense(
            self.mem_dim, dtype=self.dtype, name="proj"
        )(nn.gelu(m + f))
        return out.astype(jnp.float32)


class MemoryAttentionLayer(nn.Module):
    """Pre-norm self-attn + cross-attn(memory) + MLP (reference
    ``memory_attention.py:12`` — dropout/RoPE variants collapsed to the
    lite recipe; the memory K/V projections absorb the 64->D lift)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mem_kv, mem_mask):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.num_heads, dtype=self.dtype, name="self_attn"
        )(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + MultiHeadAttention(
            self.num_heads, dtype=self.dtype, name="cross_attn"
        )(h, kv=mem_kv, mask=mem_mask)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + Mlp(
            int(x.shape[-1] * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(h)
        return x


class MemoryAttention(nn.Module):
    """Stack of memory-attention layers + final norm (reference
    ``memory_attention.py:140``)."""

    depth: int = 2
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mem_kv, mem_mask):
        for i in range(self.depth):
            x = MemoryAttentionLayer(
                self.num_heads, dtype=self.dtype, name=f"layer{i}"
            )(x, mem_kv, mem_mask)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class SAM2(nn.Module):
    """Promptable image + video segmentation with a ring-buffer memory.

    ``track(frames, points, labels)`` propagates the frame-0 prompt through
    the clip inside one ``lax.scan`` (reference ``SAM2Model.track_step``
    ``sam.py:915`` + ``SAM2VideoPredictor``); ``__call__`` is single-frame
    promptable segmentation identical in contract to ``SAM``.
    """

    img_size: int = 256
    dim: int = 256
    mem_dim: int = 64
    enc_depth: int = 6
    enc_heads: int = 8
    dec_heads: int = 8
    mem_depth: int = 2
    num_masks: int = 3
    mem_frames: int = 4  # M: memory ring slots (reference num_maskmem=7)
    max_ptrs: int = 4  # K: object-pointer ring slots (max_obj_ptrs_in_encoder)
    dtype: Any = jnp.float32
    attn_impl: str = "einsum"
    encoder_kind: str = "vit"  # 'vit' | 'tiny' (MobileSAM, tiny_encoder.py)

    def setup(self):
        if self.encoder_kind == "tiny":
            from kuzu.models.tiny_encoder import TinyViTEncoder

            self.encoder = TinyViTEncoder(
                self.img_size, self.dim, dtype=self.dtype,
                attn_impl=self.attn_impl,
            )
        else:
            self.encoder = SAMImageEncoder(
                self.img_size, 16, self.dim, self.enc_depth, self.enc_heads,
                dtype=self.dtype, attn_impl=self.attn_impl,
            )
        self.prompt_encoder = PromptEncoder(self.dim)
        self.decoder = MaskDecoder(
            self.dim, self.dec_heads, num_masks=self.num_masks,
            dtype=self.dtype, return_tokens=True,
        )
        self.memory_encoder = MemoryEncoder(self.mem_dim, dtype=self.dtype)
        self.memory_attention = MemoryAttention(
            self.mem_depth, self.enc_heads, dtype=self.dtype
        )
        self.obj_ptr_proj = nn.Dense(self.dim, name="obj_ptr_proj")
        self.ptr_to_mem = nn.Dense(self.mem_dim, name="ptr_to_mem")
        # learned placeholder when the bank holds no memory yet
        # (reference SAM2Model no_mem_embed)
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (1, 1, self.dim)
        )

    # ------------------------------------------------------------- helpers

    @property
    def grid(self) -> int:
        return self.img_size // 16

    def _img_pe(self) -> jnp.ndarray:
        g = self.grid
        return jnp.asarray(sincos_2d_pos_embed(self.dim, g, g), jnp.float32)[None]

    def empty_bank(self, batch: int) -> dict:
        """Fixed-shape zero bank: M memory slots + K pointer slots, all
        invalid; ``idx`` counts frames written (ring position = idx % M)."""
        n = self.grid * self.grid
        return {
            "mem": jnp.zeros((batch, self.mem_frames, n, self.mem_dim)),
            "mem_valid": jnp.zeros((batch, self.mem_frames), bool),
            "mem_t": jnp.zeros((batch, self.mem_frames), jnp.int32),
            "ptr": jnp.zeros((batch, self.max_ptrs, self.dim)),
            "ptr_valid": jnp.zeros((batch, self.max_ptrs), bool),
            "ptr_t": jnp.zeros((batch, self.max_ptrs), jnp.int32),
            "idx": jnp.zeros((), jnp.int32),
        }

    # -------------------------------------------------------------- stages

    def condition(self, feat: jnp.ndarray, bank: dict, t: jnp.ndarray):
        """Memory-conditioned features (reference
        ``_prepare_memory_conditioned_features``, ``sam.py:620``)."""
        b, n, _ = feat.shape
        # memory tokens with temporal recency embedding
        rel = jnp.clip(t - bank["mem_t"], 0, 1024)  # (B, M)
        temb = sincos_1d(self.mem_dim, rel)  # (B, M, mem_dim)
        mem = bank["mem"] + temb[:, :, None, :]
        mem = mem.reshape(b, self.mem_frames * n, self.mem_dim)
        mem_ok = jnp.repeat(bank["mem_valid"], n, axis=1)  # (B, M*N)
        # object pointers -> memory width, with their own recency embedding
        ptr = self.ptr_to_mem(bank["ptr"]) + sincos_1d(
            self.mem_dim, jnp.clip(t - bank["ptr_t"], 0, 1024)
        )
        kv = jnp.concatenate([mem, ptr], axis=1)
        ok = jnp.concatenate([mem_ok, bank["ptr_valid"]], axis=1)
        mask = ok[:, None, None, :]  # (B, 1, 1, Tk)
        attended = self.memory_attention(feat, kv.astype(feat.dtype), mask)
        # first frame: no memory exists — learned no-mem placeholder instead
        # of attending over an all-masked row
        any_mem = jnp.any(ok, axis=1)[:, None, None]
        return jnp.where(
            any_mem, attended, feat + self.no_mem_embed.astype(feat.dtype)
        )

    def decode(self, feat, points, labels):
        g = self.grid
        prompts = self.prompt_encoder(points, labels)
        return self.decoder(
            feat, self._img_pe().astype(feat.dtype), prompts, (g, g)
        )

    def track_step(
        self,
        bank: dict,
        frame: jnp.ndarray,  # (B, S, S, 3)
        points: jnp.ndarray,  # (B, P, 2)
        labels: jnp.ndarray,  # (B, P)
        t: jnp.ndarray,  # scalar frame index
    ):
        """One frame: encode -> memory-condition -> decode -> write memory
        (reference ``track_step`` ``sam.py:915``)."""
        feat = self.encoder(frame, train=False)
        cond = self.condition(feat, bank, t)
        masks, iou, mask_toks = self.decode(cond, points, labels)
        best = jnp.argmax(iou, axis=1)  # (B,)
        best_mask = jnp.take_along_axis(
            masks, best[:, None, None, None], axis=1
        )[:, 0]  # (B, H4, W4)
        best_tok = jnp.take_along_axis(
            mask_toks, best[:, None, None], axis=1
        )[:, 0]  # (B, D)

        # ---- write the ring buffers (dynamic_update_slice, traced index)
        new_mem = self.memory_encoder(feat, best_mask, (self.grid, self.grid))
        mi = jnp.mod(bank["idx"], self.mem_frames)
        pi = jnp.mod(bank["idx"], self.max_ptrs)
        obj_ptr = self.obj_ptr_proj(best_tok.astype(jnp.float32))
        bank = {
            "mem": jax.lax.dynamic_update_slice(
                bank["mem"], new_mem[:, None], (0, mi, 0, 0)
            ),
            "mem_valid": jax.lax.dynamic_update_slice(
                bank["mem_valid"],
                jnp.ones((bank["mem"].shape[0], 1), bool),
                (0, mi),
            ),
            "mem_t": jax.lax.dynamic_update_slice(
                bank["mem_t"],
                jnp.full((bank["mem"].shape[0], 1), t, jnp.int32),
                (0, mi),
            ),
            "ptr": jax.lax.dynamic_update_slice(
                bank["ptr"], obj_ptr[:, None], (0, pi, 0)
            ),
            "ptr_valid": jax.lax.dynamic_update_slice(
                bank["ptr_valid"],
                jnp.ones((bank["ptr"].shape[0], 1), bool),
                (0, pi),
            ),
            "ptr_t": jax.lax.dynamic_update_slice(
                bank["ptr_t"],
                jnp.full((bank["ptr"].shape[0], 1), t, jnp.int32),
                (0, pi),
            ),
            "idx": bank["idx"] + 1,
        }
        return bank, (best_mask, jnp.max(iou, axis=1))

    def track(
        self,
        frames: jnp.ndarray,  # (B, T, S, S, 3)
        points: jnp.ndarray,  # (B, P, 2) frame-0 prompt, normalized
        labels: jnp.ndarray,  # (B, P)
    ):
        """Propagate the frame-0 prompt through the clip in one scan.
        Returns (masks (B, T, S/4, S/4) logits, iou (B, T))."""
        b, t_len = frames.shape[:2]
        bank = self.empty_bank(b)
        xs = (jnp.moveaxis(frames, 1, 0), jnp.arange(t_len))
        _, (masks, iou) = self._scan_track(bank, xs, points, labels)
        return jnp.moveaxis(masks, 0, 1), jnp.moveaxis(iou, 0, 1)

    def _scan_track(self, bank, xs, points, labels):
        """Module-level scan: track_step under lax.scan with params closed
        over via flax's lift (nn.scan over a bound method)."""
        pad_labels = jnp.full_like(labels, PAD)

        def body(mdl, carry, x):
            frame, t = x
            lbl = jnp.where(t == 0, labels, pad_labels)
            return mdl.track_step(carry, frame, points, lbl, t)

        scan = nn.scan(
            body,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        return scan(self, bank, xs)

    def __call__(self, images, points, labels, train: bool = False):
        """Single-frame promptable segmentation (SAM contract)."""
        feat = self.encoder(images, train=train)
        masks, iou, _ = self.decode(feat, points, labels)
        return masks, iou


class SAM2VideoPredictor:
    """Thin jitted wrapper matching the reference predictor surface
    (``sam/predict.py SAM2VideoPredictor``): init once, then
    ``predict(frames, box | points)`` -> per-frame masks + IoU."""

    def __init__(self, model: SAM2, variables):
        self.model = model
        self.variables = variables
        self._track = jax.jit(
            lambda v, f, p, l: model.apply(v, f, p, l, method=SAM2.track)
        )

    @classmethod
    def create(cls, model: SAM2, rng, clip_shape: tuple, num_points: int = 1):
        """Init variables through ``track`` — the only method that traces
        every submodule (the memory path is invisible to ``__call__``)."""
        b, t, s = clip_shape[0], clip_shape[1], model.img_size
        frames = jnp.zeros((b, t, s, s, 3), jnp.float32)
        points = jnp.zeros((b, num_points, 2), jnp.float32)
        labels = jnp.full((b, num_points), PAD, jnp.int32)
        variables = jax.jit(
            lambda: model.init(rng, frames, points, labels, method=SAM2.track)
        )()
        return cls(model, variables)

    def predict(self, frames, points, labels):
        return self._track(self.variables, frames, points, labels)
