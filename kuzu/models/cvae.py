"""Conditional VAE for single-glyph generation/reconstruction.

Capability parity with the reference ``SimpleCVAELitModule``
(``scripts/train_simplevit_char.py:115-246``): a class-conditional
convolutional VAE over 128x128 single-channel glyph crops — strided conv
encoder to a latent (mu, logvar), one-hot class conditioning concatenated at
both encode and decode, transposed-conv decoder, BCE+KL loss with beta
weighting, reparameterized sampling.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class ConvVAEEncoder(nn.Module):
    latent_dim: int
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray):
        """(B, 128, 128, C), (B,) -> (mu, logvar) each (B, latent)."""
        for i, ch in enumerate((32, 64, 128, 256, 512)):
            x = nn.Conv(
                ch, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        h = x.reshape(x.shape[0], -1)  # (B, 4*4*512)
        c = jax.nn.one_hot(labels, self.num_classes, dtype=h.dtype)
        hc = jnp.concatenate([h, c], axis=-1)
        mu = nn.Dense(self.latent_dim, dtype=jnp.float32, name="fc_mu")(hc)
        logvar = nn.Dense(self.latent_dim, dtype=jnp.float32, name="fc_var")(hc)
        return mu, logvar


class ConvVAEDecoder(nn.Module):
    num_classes: int
    out_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        c = jax.nn.one_hot(labels, self.num_classes, dtype=z.dtype)
        h = nn.Dense(4 * 4 * 512, dtype=self.dtype, name="fc")(
            jnp.concatenate([z, c], axis=-1)
        )
        x = h.reshape(-1, 4, 4, 512)
        for i, ch in enumerate((256, 128, 64, 32)):
            x = nn.ConvTranspose(
                ch, (4, 4), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.out_channels, (4, 4), strides=(2, 2), padding="SAME",
            dtype=jnp.float32, name="out",
        )(x)
        return x  # logits; sigmoid at sampling time


class CVAE(nn.Module):
    num_classes: int
    latent_dim: int = 100
    channels: int = 1
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.encoder = ConvVAEEncoder(self.latent_dim, self.num_classes, self.dtype)
        self.decoder = ConvVAEDecoder(self.num_classes, self.channels, self.dtype)

    def __call__(self, images: jnp.ndarray, labels: jnp.ndarray, rng: jax.Array):
        mu, logvar = self.encoder(images, labels)
        std = jnp.exp(0.5 * logvar)
        z = mu + std * jax.random.normal(rng, mu.shape)
        recon_logits = self.decoder(z, labels)
        return recon_logits, mu, logvar

    def generate(self, z: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(self.decoder(z, labels))


def cvae_loss(
    recon_logits: jnp.ndarray,
    images: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    beta: float = 1.0,
) -> tuple[jnp.ndarray, dict]:
    """BCE reconstruction + beta * KL (reference loss_function :193)."""
    bce = optax.sigmoid_binary_cross_entropy(recon_logits, images).sum(
        axis=(1, 2, 3)
    )
    kl = -0.5 * (1 + logvar - mu**2 - jnp.exp(logvar)).sum(axis=-1)
    loss = (bce + beta * kl).mean()
    return loss, {"bce": bce.mean(), "kl": kl.mean()}
