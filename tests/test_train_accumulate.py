"""Gradient accumulation semantics of ``make_train_step``.

Round-2 VERDICT item 3: ``accumulate`` was a silent no-op in the
``has_model_state=True`` (BatchNorm) branch — every YOLO detect run with
``accumulate: 2`` in its cfg silently trained on the un-accumulated batch.
These tests pin the fixed contract for both branches (reference semantics:
``accumulate = nbs/batch`` micro-step folding, ``engine/trainer.py:300,368``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from kuzu.core.train import init_state, make_train_step


class _BNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(8, (3, 3))(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x.mean(axis=(1, 2)))


def _setup(rng=0):
    model = _BNNet()
    x0 = jnp.zeros((2, 8, 8, 3))
    variables = model.init(jax.random.key(rng), x0)
    tx = optax.sgd(0.1)

    def loss_fn(params, model_state, batch, _rng):
        out, new_state = model.apply(
            {"params": params, **model_state},
            batch["x"],
            train=True,
            mutable=["batch_stats"],
        )
        loss = ((out - batch["y"]) ** 2).mean()
        return loss, ({"mse": loss}, new_state)

    return model, variables, tx, loss_fn


def _batch(n, seed=0):
    r = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(r.normal(0, 1, (n, 8, 8, 3)).astype(np.float32)),
        "y": jnp.asarray(r.normal(0, 1, (n, 1)).astype(np.float32)),
    }


def test_accumulate_model_state_equivalence():
    """accumulate=2 over a (duplicated-halves) batch == accumulate=1 over one
    half: identical param updates AND identical folded batch_stats. The
    duplication makes per-micro BN statistics equal to the full-batch ones,
    so the equivalence is exact up to float addition order."""
    model, variables, tx, loss_fn = _setup()
    half = _batch(4)
    dup = jax.tree.map(lambda a: jnp.concatenate([a, a], axis=0), half)

    def run(accumulate, batch):
        state = init_state(
            variables["params"],
            tx,
            use_ema=True,
            model_state={"batch_stats": variables["batch_stats"]},
        )
        step = make_train_step(
            loss_fn, tx, accumulate=accumulate, has_model_state=True,
            donate=False,
        )
        new_state, metrics = step(state, batch, jax.random.key(1))
        return new_state, metrics

    s1, m1 = run(1, half)
    s2, m2 = run(2, dup)

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), atol=1e-5)
    # batch_stats: two identical micro-updates fold the EMA twice; one plain
    # step folds once — verify the accumulated run actually folded twice
    # (i.e. the stats moved further toward the batch statistics, proving the
    # mutable collections thread through the scan rather than being dropped)
    bs1 = s1.model_state["batch_stats"]
    bs2 = s2.model_state["batch_stats"]
    m_once = np.asarray(jax.tree.leaves(bs1)[0])
    m_twice = np.asarray(jax.tree.leaves(bs2)[0])
    assert not np.allclose(m_once, np.zeros_like(m_once))  # moved at all
    # EMA: x1 = 0.9*x0 + 0.1*s ; x2 = 0.9*x1 + 0.1*s  =>  x2 = 1.9*x1 - 0.9*x0
    # with x0 = init stats (mean 0 / var 1 at init for BN)
    init_stats = variables["batch_stats"]
    x0 = np.asarray(jax.tree.leaves(init_stats)[0])
    np.testing.assert_allclose(m_twice, 1.9 * m_once - 0.9 * x0, atol=1e-5)


def test_accumulate_plain_grad_mean():
    """No-model-state branch: accumulate=k averages micro-grads — equal
    params to a full-batch step when the loss is a mean over samples."""
    model = nn.Dense(1)
    x0 = jnp.zeros((2, 4))
    variables = model.init(jax.random.key(0), x0)
    tx = optax.sgd(0.1)

    def loss_fn(params, batch, _rng):
        out = model.apply({"params": params}, batch["x"])
        loss = ((out - batch["y"]) ** 2).mean()
        return loss, {"mse": loss}

    r = np.random.default_rng(3)
    batch = {
        "x": jnp.asarray(r.normal(0, 1, (8, 4)).astype(np.float32)),
        "y": jnp.asarray(r.normal(0, 1, (8, 1)).astype(np.float32)),
    }

    def run(accumulate):
        state = init_state(variables["params"], tx, use_ema=False)
        step = make_train_step(
            loss_fn, tx, accumulate=accumulate, donate=False
        )
        new_state, metrics = step(state, batch, jax.random.key(1))
        return new_state, metrics

    s1, m1 = run(1)
    s4, m4 = run(4)
    # each micro-batch is a different slice, so micro-grad mean == full-batch
    # grad for a per-sample-mean loss
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), atol=1e-6)
