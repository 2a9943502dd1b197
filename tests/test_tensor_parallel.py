"""Tensor parallelism over the reserved 'model' mesh axis.

The reference is DP-only (SURVEY §2.4); kuzu keeps the model axis first-class:
parameters shard by path rules, optimizer moments inherit the placement, and
XLA inserts the TP collectives. This test trains the char-MLM with its MLP
and lm_head sharded 4-way and checks numerical equality with the replicated
run.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from kuzu.core.config import load_config
from kuzu.core.mesh import make_mesh, param_spec_rules, shard_batch, state_shardings
from kuzu.core.train import build_optimizer, init_state, make_train_step
from kuzu.models.lm import CharMLM, apply_mlm_masking

TP_RULES = [
    ("mlp/fc1/kernel", P(None, "model")),
    ("mlp/fc2/kernel", P("model", None)),
    ("lm_head/kernel", P(None, "model")),
]


def _setup(mesh):
    model = CharMLM(vocab_size=32, max_len=16, dim=64, depth=2, num_heads=2)
    tokens = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.key(0), tokens)["params"]

    def loss_fn(p, batch, rng):
        masked, labels = apply_mlm_masking(batch["tokens"], rng, mask_id=4, vocab_size=32)
        logits = model.apply({"params": p}, masked, batch["attention_mask"])
        sel = labels >= 0
        import optax

        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.where(sel, labels, 0)
        )
        loss = jnp.where(sel, ce, 0.0).sum() / jnp.maximum(sel.sum(), 1)
        return loss, {}

    cfg = load_config(overrides=["lr0=0.01", "epochs=1", "optimizer=adamw", "warmup_epochs=0"])
    tx = build_optimizer(cfg, 10)
    state = init_state(params, tx, use_ema=True)
    return model, loss_fn, tx, state


def _batch(rng):
    toks = rng.integers(5, 32, (8, 16)).astype(np.int32)
    return {
        "tokens": jnp.asarray(toks),
        "attention_mask": jnp.ones((8, 16), jnp.float32),
    }


def test_tp_matches_replicated():
    rng = np.random.default_rng(0)
    batch_np = _batch(rng)

    # replicated 8-way DP
    mesh_dp = make_mesh(data=8, model=1)
    model, loss_fn, tx, state = _setup(mesh_dp)
    step_dp = make_train_step(loss_fn, tx, mesh=mesh_dp, donate=False)
    losses_dp = []
    s = state
    for i in range(3):
        s, m = step_dp(s, shard_batch(batch_np, mesh_dp), jax.random.key(i))
        losses_dp.append(float(m["loss"]))

    # 2-way DP x 4-way TP
    mesh_tp = make_mesh(data=2, model=4)
    model, loss_fn, tx, state = _setup(mesh_tp)
    rule_fn = param_spec_rules(TP_RULES)
    st_sh = state_shardings(jax.eval_shape(lambda: state), mesh_tp, rule_fn)
    state = jax.device_put(state, st_sh)
    step_tp = make_train_step(
        loss_fn, tx, mesh=mesh_tp, donate=False, state_sharding=st_sh
    )
    losses_tp = []
    s = state
    for i in range(3):
        s, m = step_tp(s, shard_batch(batch_np, mesh_tp), jax.random.key(i))
        losses_tp.append(float(m["loss"]))

    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4)
    # the MLP kernel is genuinely sharded over the model axis
    fc1 = s.params["block0"]["mlp"]["fc1"]["kernel"]
    spec = fc1.sharding.spec
    assert "model" in str(spec), spec
    # and its per-device shard is 1/4 of the full size
    shard_shape = fc1.addressable_shards[0].data.shape
    assert shard_shape[1] * 4 == fc1.shape[1]


def test_trocr_tp_preset_matches_replicated():
    """The shipped 'trocr' TP preset: DPx4TP teacher-forced training equals
    the replicated run numerically (multi-head dims, enc+dec sharded)."""
    import optax

    from kuzu.core.mesh import tp_preset
    from kuzu.models.trocr import TrOCR

    def setup(mesh):
        model = TrOCR(
            vocab_size=24, image_size=(64, 32), patch_size=(16, 16),
            enc_dim=64, enc_depth=2, enc_heads=4,
            dec_dim=64, dec_depth=2, dec_heads=4, max_len=8,
        )
        images = jnp.zeros((1, 64, 32, 3), jnp.float32)
        tokens = jnp.zeros((1, 7), jnp.int32)
        params = jax.jit(
            lambda: model.init(jax.random.key(0), images, tokens)["params"]
        )()

        def loss_fn(p, batch, rng):
            logits = model.apply(
                {"params": p}, batch["image"], batch["tokens"][:, :-1]
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["tokens"][:, 1:]
            )
            return ce.mean(), {}

        cfg = load_config(
            overrides=["lr0=0.01", "epochs=1", "optimizer=adamw", "warmup_epochs=0"]
        )
        tx = build_optimizer(cfg, 10)
        return model, loss_fn, tx, init_state(params, tx, use_ema=False)

    rng = np.random.default_rng(1)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (8, 64, 32, 3)).astype(np.float32)),
        "tokens": jnp.asarray(rng.integers(0, 24, (8, 8)).astype(np.int32)),
    }

    mesh_dp = make_mesh(data=8, model=1)
    _, loss_fn, tx, state = setup(mesh_dp)
    step_dp = make_train_step(loss_fn, tx, mesh=mesh_dp, donate=False)
    losses_dp = []
    s = state
    for i in range(3):
        s, m = step_dp(s, shard_batch(batch, mesh_dp), jax.random.key(i))
        losses_dp.append(float(m["loss"]))

    mesh_tp = make_mesh(data=2, model=4)
    _, loss_fn, tx, state = setup(mesh_tp)
    st_sh = state_shardings(jax.eval_shape(lambda: state), mesh_tp, tp_preset("trocr"))
    state = jax.device_put(state, st_sh)
    step_tp = make_train_step(
        loss_fn, tx, mesh=mesh_tp, donate=False, state_sharding=st_sh
    )
    losses_tp = []
    s = state
    for i in range(3):
        s, m = step_tp(s, shard_batch(batch, mesh_tp), jax.random.key(i))
        losses_tp.append(float(m["loss"]))
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4, atol=2e-5)
    # the preset actually sharded something
    q = s.params["decoder"]["block0"]["self_attn"]["q"]["kernel"]
    assert "model" in str(q.sharding.spec)
