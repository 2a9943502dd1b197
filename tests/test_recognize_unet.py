"""Recognize task with the UNet-Transformer encoder (LitOCR parity)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_trocr_with_unet_encoder_trains_one_step():
    from kuzu.models.trocr import TrOCR, greedy_generate

    model = TrOCR(
        vocab_size=12,
        image_size=(64, 32),
        enc_dim=32,
        enc_depth=1,
        enc_heads=2,
        dec_dim=32,
        dec_depth=1,
        dec_heads=2,
        max_len=8,
        encoder_type="unet",
    )
    imgs = jnp.zeros((2, 64, 32, 3))
    toks = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.key(0), imgs, toks)["params"]
    logits = model.apply({"params": params}, imgs, toks)
    assert logits.shape == (2, 8, 12)
    # generation works through the same path
    out = greedy_generate(model, params, imgs, max_len=8)
    assert out.shape == (2, 8)

    # gradient flows through the conv stem
    def loss(p):
        lg = model.apply({"params": p}, imgs, toks)
        return lg.sum()

    g = jax.grad(loss)(params)
    stem = g["encoder"]["stem"]["conv"]["kernel"]
    assert np.abs(np.asarray(stem)).sum() >= 0  # finite, present
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()


def test_trocr_csa_encoder_builds():
    from kuzu.models.trocr import TrOCR

    model = TrOCR(
        vocab_size=12,
        image_size=(64, 32),
        patch_size=(16, 16),
        enc_dim=32,
        enc_depth=2,
        enc_heads=2,
        dec_dim=32,
        dec_depth=1,
        dec_heads=2,
        max_len=8,
        encoder_type="csa",
    )
    imgs = jnp.zeros((1, 64, 32, 3))
    toks = jnp.zeros((1, 8), jnp.int32)
    v = model.init(jax.random.key(0), imgs, toks)
    logits = model.apply(v, imgs, toks)
    assert logits.shape == (1, 8, 12)
