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


def test_flash_small_unaligned_n(rng):
    """Single-block path for short sequences (area attention: N = HW/area,
    e.g. 400 at 40x40/area-4) — N only needs 16-alignment."""
    q, k, v = _qkv(rng, bh=6, n=400, d=32)
    out_f = np.asarray(flash_attention(q, k, v, interpret=True))
    out_x = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(out_f, out_x, atol=2e-5)


def test_aattn_flash_matches_einsum(rng):
    """AAttn(impl='flash') == AAttn(impl='einsum') at detector shapes."""
    from kuzu.models.yolo.modules import AAttn

    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 64)).astype(np.float32))
    me = AAttn(64, num_heads=2, area=4, impl="einsum")
    v = me.init(jax.random.key(0), x)
    out_e = me.apply(v, x)
    # interpret-mode kernel on CPU (explicit impl value, no global flag)
    mf = AAttn(64, num_heads=2, area=4, impl="flash_interpret")
    out_f = mf.apply(v, x)
    np.testing.assert_allclose(
        np.asarray(out_e), np.asarray(out_f), atol=2e-4
    )


def test_area_attention_matches_xla(rng):
    """Head-packed kernel == per-head reference at kernel-native layout."""
    from kuzu.ops.flash_attention import area_attention

    g, n, heads, hd = 3, 64, 4, 32
    q, k, v = _qkv(rng, bh=g, n=n, d=heads * hd)
    out = np.asarray(area_attention(q, k, v, heads, interpret=True))
    ref = np.concatenate(
        [
            np.asarray(
                xla_attention(
                    q[..., i * hd : (i + 1) * hd],
                    k[..., i * hd : (i + 1) * hd],
                    v[..., i * hd : (i + 1) * hd],
                )
            )
            for i in range(heads)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_aattn_flash_falls_back_in_train_mode(rng):
    """impl='flash' under train=True on CPU falls back to the einsum path
    (the kernel is TPU-only); grads must flow either way."""
    from kuzu.models.yolo.modules import AAttn

    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 64)).astype(np.float32))
    m = AAttn(64, num_heads=2, area=4, impl="flash")
    v = m.init(jax.random.key(0), x)

    def loss(p):
        return (m.apply(p, x, train=False, mutable=False) ** 2).sum()

    # train=True path: differentiable end to end
    def loss_t(p):
        out, _ = m.apply(p, x, train=True, mutable=["batch_stats"])
        return (out**2).sum()

    g = jax.grad(lambda p: loss_t(p))(v)
    assert all(np.isfinite(x_).all() for x_ in jax.tree.leaves(g))


def test_area_attention_trainable_grads_match_einsum(rng):
    """custom-vjp backward == autodiff through the einsum reference."""
    import sys

    fa = sys.modules["kuzu.ops.flash_attention"]
    g_, n, heads, hd = 2, 32, 2, 16
    q, k, v = _qkv(rng, bh=g_, n=n, d=heads * hd)

    def ref_loss(q_, k_, v_):
        def hsplit(t):
            return t.reshape(g_, n, heads, hd).transpose(0, 2, 1, 3).reshape(
                g_ * heads, n, hd
            )

        out = xla_attention(hsplit(q_), hsplit(k_), hsplit(v_))
        return (out.astype(jnp.float32) ** 2).sum()

    def ker_loss(q_, k_, v_):
        out = fa.area_attention_trainable(q_, k_, v_, heads, True)
        return (out.astype(jnp.float32) ** 2).sum()

    gk = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-3, rtol=2e-2,
        )


def test_eval_mode_flash_is_differentiable(rng):
    """Gradients through apply(train=False) with the flash path must flow
    (distillation / input-gradient use): the custom-vjp wrapper routes the
    backward into the VMEM flash-backward kernel instead of a Pallas AD
    error (round-2 ADVICE)."""
    from kuzu.models.yolo.modules import AAttn

    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 64)).astype(np.float32))
    m = AAttn(64, num_heads=2, area=4, impl="flash_interpret")
    v = m.init(jax.random.key(0), x)

    def loss(p, x_):
        return (m.apply(p, x_, train=False) ** 2).sum()

    gp = jax.grad(loss)(v, x)
    gx = jax.grad(loss, argnums=1)(v, x)
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(gp))
    assert np.isfinite(np.asarray(gx)).all() and np.abs(np.asarray(gx)).max() > 0


def test_flash_bwd_kernel_matches_autodiff(rng):
    """area_attention_bwd (Pallas, interpret) == autodiff through einsum."""
    import sys

    fa = sys.modules["kuzu.ops.flash_attention"]
    g_, n, heads, hd = 2, 48, 3, 32
    q, k, v = _qkv(rng, bh=g_, n=n, d=heads * hd)
    do = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, q.shape).astype(np.float32)
    )

    def ref(q_, k_, v_):
        def hsplit(t):
            return t.reshape(g_, n, heads, hd).transpose(0, 2, 1, 3).reshape(
                g_ * heads, n, hd
            )

        out = xla_attention(hsplit(q_), hsplit(k_), hsplit(v_))
        return (
            out.reshape(g_, heads, n, hd).transpose(0, 2, 1, 3).reshape(g_, n, -1)
        )

    _, vjp = jax.vjp(ref, q, k, v)
    want = vjp(do)
    got = fa.area_attention_bwd(q, k, v, do, heads, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-3, rtol=2e-2,
        )


def test_trocr_encoder_flash_matches_einsum_fwd_and_grad():
    """MultiHeadAttention's flash path (ViT encoder self-attention) is
    numerically the einsum path: same params, same output, same input
    gradient — kernels in Pallas interpret mode on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kuzu.models.trocr import ViTEncoder

    kw = dict(image_size=(128, 32), patch_size=(16, 16), dim=32, depth=2,
              num_heads=2)
    enc_e = ViTEncoder(**kw, attn_impl="einsum")
    enc_f = ViTEncoder(**kw, attn_impl="flash_interpret")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 128, 32, 3)), jnp.float32
    )
    variables = enc_e.init(jax.random.key(0), x, train=False)

    ye = enc_e.apply(variables, x, train=False)
    yf = enc_f.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(ye), np.asarray(yf), atol=2e-5)

    def loss(fn):
        return lambda v, inp: (fn.apply(v, inp, train=True) ** 2).sum()

    ge = jax.grad(loss(enc_e), argnums=1)(variables, x)
    gf = jax.grad(loss(enc_f), argnums=1)(variables, x)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(gf), atol=3e-4)
