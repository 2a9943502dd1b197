import jax
import jax.numpy as jnp
import numpy as np
import optax


def _setup():
    from kuzu.models.stackgan import StackGenerator, StageDiscriminator

    gen = StackGenerator(num_classes=3, latent_dim=16, base_ch=64)
    discs = [StageDiscriminator(num_classes=3, base_ch=16) for _ in range(3)]
    z = jnp.zeros((2, 16))
    labels = jnp.asarray([0, 1])
    g_params = gen.init(jax.random.key(0), z, labels)["params"]
    fakes = gen.apply({"params": g_params}, z, labels)
    d_params = [
        d.init(jax.random.key(i), fakes[i], labels)["params"]
        for i, d in enumerate(discs)
    ]
    return gen, discs, g_params, d_params


def test_generator_stage_shapes():
    gen, discs, g_params, d_params = _setup()
    fakes = gen.apply({"params": g_params}, jnp.zeros((2, 16)), jnp.asarray([0, 2]))
    assert [f.shape for f in fakes] == [(2, 32, 32, 1), (2, 64, 64, 1), (2, 128, 128, 1)]
    for f in fakes:
        arr = np.asarray(f)
        assert arr.min() >= -1 and arr.max() <= 1


def test_bcr_and_hinge_losses():
    from kuzu.models.stackgan import bcr_augment, hinge_d_loss, hinge_g_loss

    real = jnp.asarray([2.0, 0.5])
    fake = jnp.asarray([-2.0, 0.5])
    assert float(hinge_d_loss(real, fake)) == (0.0 + 0.5 + 0.0 + 1.5) / 2
    assert float(hinge_g_loss(fake)) == 0.75
    imgs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 1)))
    aug = bcr_augment(imgs, jax.random.key(0))
    assert aug.shape == imgs.shape


def test_gan_steps_adversarial_dynamics():
    """A few alternating steps: finite losses, D separates real from fake."""
    from kuzu.models.stackgan import make_gan_steps, multiscale_targets

    gen, discs, g_params, d_params = _setup()
    g_tx = optax.adam(2e-4, b1=0.0)
    d_tx = optax.adam(2e-4, b1=0.0)
    g_opt = g_tx.init(g_params)
    d_opts = [d_tx.init(p) for p in d_params]
    d_step, g_step = make_gan_steps(gen, discs, g_tx, d_tx, bcr_weight=1.0)

    rng = np.random.default_rng(0)
    img = np.full((2, 128, 128, 1), -1.0, np.float32)
    img[0, 40:90, 40:90] = 1.0
    img[1, 20:40, :] = 1.0
    batch = {"image": jnp.asarray(img), "label": jnp.asarray([0, 1])}

    for i in range(6):
        d_params, d_opts, d_loss = d_step(d_params, d_opts, g_params, batch, jax.random.key(2 * i))
        g_params, g_opt, g_loss = g_step(g_params, g_opt, d_params, batch, jax.random.key(2 * i + 1))
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))

    # after D training, real logits exceed fake logits at full res
    z = jax.random.normal(jax.random.key(99), (2, 16))
    fakes = gen.apply({"params": g_params}, z, batch["label"])
    reals = multiscale_targets(batch["image"])
    d = discs[2]
    rl = np.asarray(d.apply({"params": d_params[2]}, reals[2], batch["label"]))
    fl = np.asarray(d.apply({"params": d_params[2]}, fakes[2], batch["label"]))
    assert rl.mean() > fl.mean()
