import jax
import jax.numpy as jnp
import numpy as np

from kuzu.models.cvae import CVAE, cvae_loss


def test_cvae_shapes_and_loss():
    model = CVAE(num_classes=5, latent_dim=16)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 128, 128, 1)), jnp.float32
    )
    labels = jnp.asarray([1, 3])
    v = model.init(jax.random.key(0), imgs, labels, jax.random.key(1))
    recon, mu, logvar = model.apply(v, imgs, labels, jax.random.key(2))
    assert recon.shape == (2, 128, 128, 1)
    assert mu.shape == (2, 16)
    loss, m = cvae_loss(recon, imgs, mu, logvar)
    assert np.isfinite(float(loss))
    assert float(m["kl"]) >= 0 or np.isfinite(float(m["kl"]))


def test_cvae_generation_conditioned():
    model = CVAE(num_classes=5, latent_dim=16)
    imgs = jnp.zeros((1, 128, 128, 1))
    v = model.init(jax.random.key(0), imgs, jnp.zeros(1, jnp.int32), jax.random.key(1))
    z = jnp.zeros((2, 16))
    a = model.apply(v, z, jnp.asarray([0, 0]), method=CVAE.generate)
    b = model.apply(v, z, jnp.asarray([0, 4]), method=CVAE.generate)
    assert a.shape == (2, 128, 128, 1)
    assert (np.asarray(a) >= 0).all() and (np.asarray(a) <= 1).all()
    # same z, different class -> different output (conditioning matters)
    assert not np.allclose(np.asarray(b[0]), np.asarray(b[1]))


def test_cvae_trains_to_reconstruct():
    import optax

    model = CVAE(num_classes=2, latent_dim=8)
    rng = np.random.default_rng(0)
    imgs = np.zeros((4, 128, 128, 1), np.float32)
    imgs[:2, 30:90, 30:90] = 1.0  # class 0: square
    imgs[2:, 50:70, :] = 1.0  # class 1: band
    imgs = jnp.asarray(imgs)
    labels = jnp.asarray([0, 0, 1, 1])
    v = model.init(jax.random.key(0), imgs, labels, jax.random.key(1))
    params = v["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            recon, mu, logvar = model.apply({"params": p}, imgs, labels, key)
            loss, _ = cvae_loss(recon, imgs, mu, logvar, beta=0.1)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    l0 = None
    for i in range(60):
        params, opt, loss = step(params, opt, jax.random.key(i))
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < 0.5 * l0
