"""SAM-lite: promptable segmentation (image encoder + prompt encoder +
two-way mask decoder), TPU-native.

Capability parity with the reference SAM family
(``yolov12/ultralytics/models/sam/``): the same three-module anatomy —
ViT image encoder (``modules/encoders.py``), point/box prompt encoder with
random-Fourier positional encoding (``encoders.py PromptEncoder``), and a
two-way transformer mask decoder with IoU-prediction and multimask output
(``modules/decoders.py MaskDecoder`` / ``transformer.py TwoWayTransformer``)
— re-sized for from-scratch training (the reference loads SA-1B
pretrained checkpoints; zero-egress forbids weights here, so kuzu trains
its own on task data via ``task=sam``). Everything is fixed-shape: prompts
pad to a static count with label -1, masks decode at stride 4.

TPU design notes: the encoder reuses the kuzu ViT blocks (Pallas flash
attention available through the same ``attn_impl`` switch); the decoder's
token count is tiny (4 output tokens + padded prompts), so its attention
stays einsum; mask synthesis is one einsum over the upsampled embedding —
MXU work, no gather/scatter.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kuzu.models.layers import Mlp, MultiHeadAttention, PatchEmbed, sincos_2d_pos_embed

# prompt label convention (reference PromptEncoder point labels)
PAD, BG, FG, BOX_TL, BOX_BR = -1, 0, 1, 2, 3


class FourierPE(nn.Module):
    """Random-Fourier positional encoding of normalized [0,1] coords
    (reference ``PositionEmbeddingRandom``)."""

    dim: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:  # (..., 2)
        gauss = self.param(
            "gauss",
            lambda k, s: self.scale * jax.random.normal(k, s),
            (2, self.dim // 2),
        )
        x = (2.0 * coords - 1.0) @ jax.lax.stop_gradient(gauss)
        x = 2 * jnp.pi * x
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


class PromptEncoder(nn.Module):
    """Points/boxes -> sparse prompt tokens. Boxes arrive as two labeled
    corner points (BOX_TL/BOX_BR), padding as label PAD."""

    dim: int

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,  # (B, P, 2) in [0,1]
        labels: jnp.ndarray,  # (B, P) in {-1, 0, 1, 2, 3}
    ) -> jnp.ndarray:
        pe = FourierPE(self.dim, name="pe")(points)
        type_emb = self.param(
            "type_embed", nn.initializers.normal(0.02), (5, self.dim)
        )
        not_a_point = self.param(
            "not_a_point", nn.initializers.normal(0.02), (self.dim,)
        )
        tok = pe + type_emb[jnp.clip(labels + 1, 0, 4)]
        return jnp.where((labels == PAD)[..., None], not_a_point[None, None], tok)


class TwoWayBlock(nn.Module):
    """One decoder block: token self-attn, token->image cross-attn, MLP,
    image->token cross-attn (reference ``TwoWayAttentionBlock``)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, tokens, img, tok_pe, img_pe):
        q = tokens if self.skip_first_pe else tokens + tok_pe
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            tokens
            + MultiHeadAttention(self.num_heads, dtype=self.dtype, name="self_attn")(q)
        )
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            tokens
            + MultiHeadAttention(self.num_heads, dtype=self.dtype, name="t2i")(
                tokens + tok_pe, kv=img + img_pe
            )
        )
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            tokens
            + Mlp(
                int(tokens.shape[-1] * self.mlp_ratio),
                dtype=self.dtype,
                name="mlp",
            )(tokens)
        )
        img = nn.LayerNorm(dtype=self.dtype, name="norm4")(
            img
            + MultiHeadAttention(self.num_heads, dtype=self.dtype, name="i2t")(
                img + img_pe, kv=tokens + tok_pe
            )
        )
        return tokens, img


class MaskDecoder(nn.Module):
    """Two-way transformer -> multimask logits + IoU predictions
    (reference ``MaskDecoder.predict_masks``)."""

    dim: int
    num_heads: int = 8
    depth: int = 2
    num_masks: int = 3
    dtype: Any = jnp.float32
    # SAM2 needs the raw mask-token outputs to derive object pointers
    # (reference sam.py:887 _encode_memory_in_output / obj_ptr_proj)
    return_tokens: bool = False

    @nn.compact
    def __call__(
        self,
        img: jnp.ndarray,  # (B, Hg*Wg, D) encoder memory
        img_pe: jnp.ndarray,  # (1, Hg*Wg, D)
        prompts: jnp.ndarray,  # (B, P, D)
        grid_hw: tuple[int, int],
    ):
        b = img.shape[0]
        out_tok = self.param(
            "output_tokens",
            nn.initializers.normal(0.02),
            (1 + self.num_masks, self.dim),
        )  # [iou, mask_0..mask_k]
        tokens = jnp.concatenate(
            [jnp.tile(out_tok[None], (b, 1, 1)), prompts], axis=1
        )
        tok_pe = jnp.zeros_like(tokens)
        for i in range(self.depth):
            tokens, img = TwoWayBlock(
                self.num_heads,
                dtype=self.dtype,
                skip_first_pe=(i == 0),
                name=f"block{i}",
            )(tokens, img, tok_pe, img_pe)
        # final token->image attention
        tokens = nn.LayerNorm(dtype=self.dtype, name="final_norm")(
            tokens
            + MultiHeadAttention(self.num_heads, dtype=self.dtype, name="final_t2i")(
                tokens, kv=img + img_pe
            )
        )
        hg, wg = grid_hw
        d = self.dim
        src = img.reshape(b, hg, wg, d)
        # stride-16 grid -> stride-4 masks: two 2x transposed convs
        src = nn.ConvTranspose(
            d // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="up1"
        )(src)
        src = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="up_norm")(src))
        src = nn.ConvTranspose(
            d // 8, (2, 2), strides=(2, 2), dtype=self.dtype, name="up2"
        )(src)
        src = nn.gelu(src)  # (B, 4Hg, 4Wg, D/8)
        iou_tok = tokens[:, 0]
        mask_toks = tokens[:, 1 : 1 + self.num_masks]
        # per-mask-token hypernetwork MLP -> mask embedding
        hyper = []
        for i in range(self.num_masks):
            h = mask_toks[:, i]
            for j in range(2):
                h = nn.relu(
                    nn.Dense(d, dtype=self.dtype, name=f"hyper{i}_{j}")(h)
                )
            hyper.append(nn.Dense(d // 8, dtype=self.dtype, name=f"hyper{i}_out")(h))
        hyper = jnp.stack(hyper, axis=1)  # (B, K, D/8)
        masks = jnp.einsum(
            "bkc,bhwc->bkhw", hyper, src, preferred_element_type=jnp.float32
        )
        iou = iou_tok
        for j in range(2):
            iou = nn.relu(nn.Dense(d, dtype=self.dtype, name=f"iou{j}")(iou))
        iou = nn.Dense(self.num_masks, dtype=jnp.float32, name="iou_out")(iou)
        if self.return_tokens:
            return masks.astype(jnp.float32), iou, mask_toks
        return masks.astype(jnp.float32), iou


class SAMImageEncoder(nn.Module):
    """Plain ViT over square images (reference ``ImageEncoderViT``) —
    built from the kuzu encoder blocks; patch 16, sincos PE."""

    img_size: int = 256
    patch: int = 16
    dim: int = 256
    depth: int = 6
    num_heads: int = 8
    dtype: Any = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from kuzu.models.layers import EncoderBlock
        from kuzu.ops.images import from_uint8

        x = from_uint8(images)
        g = self.img_size // self.patch
        x = PatchEmbed(self.dim, (self.patch, self.patch), dtype=self.dtype)(x)
        x = x + jnp.asarray(sincos_2d_pos_embed(self.dim, g, g), x.dtype)[None]
        for i in range(self.depth):
            x = EncoderBlock(
                self.num_heads, 4.0, 0.0, self.dtype,
                attn_impl=self.attn_impl, name=f"block{i}",
            )(x, deterministic=not train)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class SAM(nn.Module):
    """Promptable segmentation model: encode once, decode per prompt set.

    ``__call__(images, points, labels)`` -> (mask logits (B, K, S/4, S/4),
    IoU predictions (B, K)). Coordinates normalized to [0,1].
    """

    img_size: int = 256
    dim: int = 256
    enc_depth: int = 6
    enc_heads: int = 8
    dec_heads: int = 8
    num_masks: int = 3
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
            dtype=self.dtype,
        )

    def _img_pe(self) -> jnp.ndarray:
        g = self.img_size // 16
        return jnp.asarray(sincos_2d_pos_embed(self.dim, g, g), jnp.float32)[None]

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(images, train=False)

    def decode(self, memory, points, labels):
        g = self.img_size // 16
        prompts = self.prompt_encoder(points, labels)
        return self.decoder(
            memory, self._img_pe().astype(memory.dtype), prompts, (g, g)
        )

    def __call__(self, images, points, labels, train: bool = False):
        memory = self.encoder(images, train=train)
        return self.decode(memory, points, labels)


def box_to_prompt(box_xyxy: np.ndarray, img_size: int) -> tuple[np.ndarray, np.ndarray]:
    """A box prompt as two labeled corner points (normalized)."""
    b = np.asarray(box_xyxy, np.float32) / img_size
    pts = np.stack([b[..., [0, 1]], b[..., [2, 3]]], axis=-2)
    lbl = np.broadcast_to(
        np.array([BOX_TL, BOX_BR], np.int32), pts.shape[:-1]
    ).copy()
    return pts, lbl
