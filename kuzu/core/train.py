"""Training engine: jitted sharded train step, EMA pytree, optimizer factory.

TPU-native rebuild of the reference's ``BaseTrainer`` machinery
(``yolov12/ultralytics/engine/trainer.py:230-477``): the warmup/cosine LR
schedule, per-group weight decay (no decay on bias/norm), EMA with decay ramp
(``utils/torch_utils.py:495`` ModelEMA, tau=2000), gradient accumulation
(``accumulate = nbs/batch``) and DDP gradient averaging — but expressed as one
jit'd function over a `Mesh`:

- the global batch enters sharded over the ``data`` axis; XLA inserts the
  gradient all-reduce (the NCCL bucket all-reduce of ``trainer.py:390``)
  automatically from the shardings;
- AMP/GradScaler is replaced by native bf16 compute (no loss scaling on TPU);
- EMA is a plain pytree folded through the same jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    model_state: Any = None  # mutable collections (e.g. batch_stats)

    def replace(self, **kw: Any) -> "TrainState":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------- optimizers


def _decay_mask(params: Any) -> Any:
    """True for weight-decayed leaves: 2D+ kernels only (no bias/norm/embed
    scales) — matching the reference's three param groups
    (``trainer.py:759`` build_optimizer: g0 norm-weights no decay, g1 weights
    decay, g2 biases no decay)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def lr_schedule(cfg: Any, steps_per_epoch: int) -> optax.Schedule:
    """Warmup (linear, ``warmup_epochs``) then linear or cosine decay to
    ``lr0*lrf`` over ``epochs`` — the reference's ``one_cycle``/linear lambda
    (``trainer.py:209``) plus warmup interp (``trainer.py:367-377``)."""
    total = max(int(cfg.epochs * steps_per_epoch), 1)
    warmup = int(float(cfg.get("warmup_epochs", 0.0)) * steps_per_epoch)
    lr0, lrf = float(cfg.lr0), float(cfg.lrf)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        wu = jnp.clip(step / jnp.maximum(warmup, 1), 0.0, 1.0)
        frac = jnp.clip((step - warmup) / jnp.maximum(total - warmup, 1), 0.0, 1.0)
        if cfg.get("cos_lr", False):
            decay = lrf + (1 - lrf) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
        else:
            decay = 1.0 - frac * (1.0 - lrf)
        return lr0 * jnp.where(warmup > 0, wu, 1.0) * decay

    return sched


def build_optimizer(cfg: Any, steps_per_epoch: int = 100) -> optax.GradientTransformation:
    """Optimizer factory mirroring the reference's ``auto`` rules."""
    name = str(cfg.get("optimizer", "auto")).lower()
    sched = lr_schedule(cfg, steps_per_epoch)
    wd = float(cfg.get("weight_decay", 0.0))
    mom = float(cfg.get("momentum", 0.937))
    if name == "auto":
        name = "sgd"
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=_decay_mask),
            optax.sgd(sched, momentum=mom, nesterov=True),
        )
    elif name in ("adam", "adamw"):
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=_decay_mask),
            optax.adam(sched, b1=mom, b2=0.999),
        )
    elif name in ("radam", "radam_schedulefree"):
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=_decay_mask),
            optax.radam(sched, b1=mom),
        )
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    clip = float(cfg.get("grad_clip", 10.0))
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


# ---------------------------------------------------------------------- EMA


def ema_decay_at(step: jnp.ndarray, decay: float, tau: float) -> jnp.ndarray:
    """Ramped decay d(step) = decay * (1 - exp(-step/tau)) — reference
    ``ModelEMA`` (``utils/torch_utils.py:495``, ramp 2000)."""
    return decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))


def ema_update(ema: Any, params: Any, d: jnp.ndarray) -> Any:
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, params)


# --------------------------------------------------------------- train step


def init_state(
    params: Any,
    tx: optax.GradientTransformation,
    use_ema: bool = True,
    model_state: Any = None,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        model_state=model_state,
    )


def make_train_step(
    loss_fn: Callable[..., tuple[jnp.ndarray, dict]],
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
    ema_decay: float = 0.9999,
    ema_tau: float = 2000.0,
    accumulate: int = 1,
    donate: bool = True,
    has_model_state: bool = False,
    state_sharding: Any = None,
):
    """Build the jitted train step.

    ``loss_fn(params, batch, rng) -> (loss, metrics_dict)`` sees the *global*
    batch; under the mesh the batch arrives sharded on axis 0 and XLA derives
    the gradient all-reduce. ``accumulate > 1`` folds micro-batches with a
    `lax.scan` (reference: ``accumulate = nbs/batch`` step-skipping).

    With ``has_model_state=True`` the signature becomes
    ``loss_fn(params, model_state, batch, rng) -> (loss, (metrics, new_state))``
    — used by models with BatchNorm running stats; under a sharded batch XLA
    reduces the batch statistics across devices automatically (free SyncBN,
    vs. the reference's rank-0 buffer broadcast).
    """
    if has_model_state:
        inner = loss_fn

        def _plain(params, batch, rng, model_state):
            loss, (metrics, new_state) = inner(params, model_state, batch, rng)
            return loss, (metrics, new_state)

        grad_fn_ms = jax.value_and_grad(_plain, has_aux=True)

        def micro_grad(params, model_state, mb, r):
            (loss, (metrics, new_state)), grads = grad_fn_ms(
                params, mb, r, model_state
            )
            return loss, metrics, new_state, grads

    else:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro_grad(params, model_state, mb, r):
            (loss, metrics), grads = grad_fn(params, mb, r)
            return loss, metrics, model_state, grads

    def step_fn(state: TrainState, batch: Any, rng: jax.Array):
        if accumulate > 1:
            # batch leading axis folds into (accumulate, micro, ...); the
            # mutable collections (BatchNorm running stats) thread through
            # the scan carry so every micro-batch's EMA update lands, same
            # as `accumulate` sequential small batches would
            def fold(x):
                return x.reshape((accumulate, x.shape[0] // accumulate) + x.shape[1:])

            micro = jax.tree.map(fold, batch)
            rngs = jax.random.split(rng, accumulate)

            def scan_body(carry, xs):
                g_acc, loss_acc, metrics_acc, ms = carry
                mb, r = xs
                loss, metrics, ms, grads = micro_grad(state.params, ms, mb, r)
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
                return (g_acc, loss_acc + loss, metrics_acc, ms), None

            loss0, m0, ms0, g0 = micro_grad(
                state.params,
                state.model_state,
                jax.tree.map(lambda x: x[0], micro),
                rngs[0],
            )
            (grads, loss, metrics, new_model_state), _ = jax.lax.scan(
                scan_body,
                (g0, loss0, m0, ms0),
                (jax.tree.map(lambda x: x[1:], micro), rngs[1:]),
            )
            inv = 1.0 / accumulate
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            metrics = jax.tree.map(lambda m: m * inv, metrics)
        else:
            loss, metrics, new_model_state, grads = micro_grad(
                state.params, state.model_state, batch, rng
            )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        if state.ema_params is not None:
            d = ema_decay_at(new_step, ema_decay, ema_tau)
            ema_params = ema_update(state.ema_params, params, d)
        else:
            ema_params = None
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(
                step=new_step,
                params=params,
                opt_state=opt_state,
                ema_params=ema_params,
                model_state=new_model_state,
            ),
            metrics,
        )

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        st_sh = state_sharding if state_sharding is not None else repl
        return jax.jit(
            step_fn,
            in_shardings=(st_sh, data_sh, repl),
            out_shardings=(st_sh, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


# ------------------------------------------------------------ eval stepping


def make_eval_step(eval_fn: Callable, mesh: Mesh | None = None):
    """Jit an eval function (params, batch) -> pytree, batch-sharded."""
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        return jax.jit(eval_fn, in_shardings=(repl, data_sh), out_shardings=data_sh)
    return jax.jit(eval_fn)
