import jax
import jax.numpy as jnp
import numpy as np

from kuzu.ops.flash_attention import flash_attention, xla_attention


def _qkv(rng, bh=2, n=256, d=64, dtype=np.float32):
    return tuple(
        jnp.asarray(rng.normal(0, 1, (bh, n, d)).astype(dtype)) for _ in range(3)
    )


def test_flash_matches_xla(rng):
    q, k, v = _qkv(rng)
    out_f = np.asarray(flash_attention(q, k, v, interpret=True))
    out_x = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(out_f, out_x, atol=2e-5)


def test_flash_d_padding(rng):
    q, k, v = _qkv(rng, d=32)  # D < 128 -> lane padding path
    out_f = np.asarray(flash_attention(q, k, v, interpret=True))
    out_x = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(out_f, out_x, atol=2e-5)


def test_flash_numerical_stability_large_logits(rng):
    q, k, v = _qkv(rng, n=128)
    q = q * 30.0  # large logits: naive softmax would overflow in exp
    out_f = np.asarray(flash_attention(q, k, v, interpret=True))
    assert np.isfinite(out_f).all()
    out_x = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(out_f, out_x, atol=1e-4)
