"""StackGAN-v2-style multi-stage conditional GAN with BCR for glyph synthesis.

Capability parity with the reference ``scripts/train_stackganv2_bcr_char.py``
(P32): class-conditional multi-stage generation of single-glyph images
(coarse 32px stage refined to 64px and 128px), one discriminator per stage,
hinge adversarial losses, and **balanced consistency regularization** (bCR:
D's logits should be invariant to augmentations applied equally to real and
fake batches).

flax/optax implementation: generator stages share a trunk; each stage has an
RGB/Lum head; discriminators are strided conv stacks with projection
conditioning (class embedding dotted with features — the standard cGAN
projection), all bf16-friendly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class _GBlock(nn.Module):
    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch), dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.2)


class StackGenerator(nn.Module):
    """z + class -> images at 32, 64, 128 px (stages share the trunk)."""

    num_classes: int
    latent_dim: int = 100
    base_ch: int = 256
    channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, labels: jnp.ndarray) -> list[jnp.ndarray]:
        c = nn.Embed(self.num_classes, 64, dtype=self.dtype, name="cls_embed")(labels)
        h = nn.Dense(4 * 4 * self.base_ch, dtype=self.dtype, name="fc")(
            jnp.concatenate([z, c], axis=-1)
        )
        x = nn.leaky_relu(h.reshape(-1, 4, 4, self.base_ch), 0.2)
        outs = []
        ch = self.base_ch
        for stage, n_up in enumerate((3, 1, 1)):  # 4->32, 32->64, 64->128
            for i in range(n_up):
                ch = max(ch // 2, 32)
                x = _GBlock(ch, dtype=self.dtype, name=f"s{stage}_up{i}")(x)
            rgb = nn.Conv(
                self.channels, (3, 3), padding="SAME", dtype=jnp.float32,
                name=f"s{stage}_rgb",
            )(x)
            outs.append(nn.tanh(rgb))  # [-1, 1]
        return outs  # [(B,32,32,C), (B,64,64,C), (B,128,128,C)]


class StageDiscriminator(nn.Module):
    """Projection-conditional discriminator for one resolution."""

    num_classes: int
    base_ch: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        x = img
        ch = self.base_ch
        while x.shape[1] > 4:
            x = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            ch = min(ch * 2, 512)
        feat = x.mean(axis=(1, 2))  # (B, ch)
        out = nn.Dense(1, dtype=jnp.float32, name="head")(feat)[:, 0]
        emb = nn.Embed(self.num_classes, feat.shape[-1], dtype=self.dtype,
                       name="proj")(labels)
        return out + (feat * emb).sum(-1).astype(jnp.float32)  # projection cGAN


def hinge_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return (
        jnp.maximum(0.0, 1.0 - real_logits).mean()
        + jnp.maximum(0.0, 1.0 + fake_logits).mean()
    )


def hinge_g_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return -fake_logits.mean()


def bcr_augment(imgs: jnp.ndarray, rng: jax.Array, max_shift: int = 4) -> jnp.ndarray:
    """Light augmentation for bCR: random shift + horizontal flip."""
    r1, r2, r3 = jax.random.split(rng, 3)
    sx = jax.random.randint(r1, (), -max_shift, max_shift + 1)
    sy = jax.random.randint(r2, (), -max_shift, max_shift + 1)
    out = jnp.roll(imgs, (sy, sx), axis=(1, 2))
    flip = jax.random.bernoulli(r3)
    return jax.lax.cond(flip, lambda x: x[:, :, ::-1], lambda x: x, out)


def bcr_loss(
    d_apply, d_params, imgs: jnp.ndarray, labels: jnp.ndarray, rng: jax.Array,
    weight: float = 10.0,
) -> jnp.ndarray:
    """Balanced consistency: |D(x) - D(aug(x))|^2 (applied to real and fake)."""
    logits = d_apply(d_params, imgs, labels)
    logits_aug = d_apply(d_params, bcr_augment(imgs, rng), labels)
    return weight * jnp.mean((logits - logits_aug) ** 2)


def multiscale_targets(imgs: jnp.ndarray) -> list[jnp.ndarray]:
    """Full-res batch [-1,1] -> per-stage targets (32, 64, 128)."""
    b, h, w, c = imgs.shape
    return [
        jax.image.resize(imgs, (b, s, s, c), "bilinear") for s in (32, 64, 128)
    ]


def make_gan_steps(
    gen: StackGenerator,
    discs: list[StageDiscriminator],
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    bcr_weight: float = 10.0,
):
    """Jitted alternating G/D steps over all stages."""

    @jax.jit
    def d_step(d_params_list, d_opts, g_params, batch, rng):
        z_rng, *stage_rngs = jax.random.split(rng, 1 + len(discs))
        z = jax.random.normal(z_rng, (batch["image"].shape[0], gen.latent_dim))
        fakes = gen.apply({"params": g_params}, z, batch["label"])
        reals = multiscale_targets(batch["image"])
        new_params, new_opts, losses = [], [], []
        for i, disc in enumerate(discs):
            def loss_fn(dp, i=i, disc=disc):
                d_apply = lambda p, x, y: disc.apply({"params": p}, x, y)
                real_l = d_apply(dp, reals[i], batch["label"])
                fake_l = d_apply(dp, jax.lax.stop_gradient(fakes[i]), batch["label"])
                loss = hinge_d_loss(real_l, fake_l)
                loss += bcr_loss(d_apply, dp, reals[i], batch["label"],
                                 stage_rngs[i], bcr_weight)
                loss += bcr_loss(d_apply, dp, jax.lax.stop_gradient(fakes[i]),
                                 batch["label"], stage_rngs[i], bcr_weight)
                return loss

            loss, g = jax.value_and_grad(loss_fn)(d_params_list[i])
            up, opt = d_tx.update(g, d_opts[i])
            new_params.append(optax.apply_updates(d_params_list[i], up))
            new_opts.append(opt)
            losses.append(loss)
        return new_params, new_opts, jnp.stack(losses).mean()

    @jax.jit
    def g_step(g_params, g_opt, d_params_list, batch, rng):
        z = jax.random.normal(rng, (batch["image"].shape[0], gen.latent_dim))

        def loss_fn(gp):
            fakes = gen.apply({"params": gp}, z, batch["label"])
            loss = 0.0
            for i, disc in enumerate(discs):
                loss += hinge_g_loss(
                    disc.apply({"params": d_params_list[i]}, fakes[i], batch["label"])
                )
            return loss / len(discs)

        loss, g = jax.value_and_grad(loss_fn)(g_params)
        up, g_opt = g_tx.update(g, g_opt)
        return optax.apply_updates(g_params, up), g_opt, loss

    return d_step, g_step
