"""Device mesh + sharding bootstrap.

TPU-native replacement for the reference's NCCL/DDP stack
(``yolov12/ultralytics/engine/trainer.py:217-228`` process-group init,
``utils/dist.py`` torchrun launcher, ``DistributedSampler``): a single
controller builds a `jax.sharding.Mesh`, the global batch is sharded over the
``data`` axis with `NamedSharding`, and gradient averaging is an XLA `psum`
inserted by the compiler — no subprocess relaunch, no rank plumbing.

The ``model`` axis is reserved for tensor parallelism (unused by the
reference, kept first-class here so large recognizer/LM configs can shard).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices: list | None = None
) -> Mesh:
    """Build a (data, model) mesh over local (or given) devices.

    ``data=-1`` consumes all devices not used by ``model``.
    """
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if model < 1:
        model = 1
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def auto_data_axis(batch: int, n_devices: int) -> int:
    """Largest divisor of ``batch`` that is <= n_devices (so a global batch
    shards evenly; the reference instead forces batch % WORLD_SIZE == 0)."""
    for d in range(min(batch, n_devices), 0, -1):
        if batch % d == 0:
            return d
    return 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch pytree: leading axis split over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, sharded along axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


class DataParallel:
    """Inference placement over a ``(data, model)`` mesh.

    ``dp=N`` on any predictor (or the cascade) shards every host-facing
    batch's leading axis over N devices and replicates the weights once at
    setup; the existing jitted programs then compile GSPMD-partitioned —
    the scaling-book recipe (annotate input shardings, let XLA insert the
    collectives), applied to serving. ``tp=M`` additionally shards the
    weights themselves over the ``model`` axis using the same path rules
    as tensor-parallel training (``TP_PRESETS``) — serving a recognizer/LM
    too large for one chip's HBM is the same config knob as training it.
    The reference has no inference parallelism at all (single-GPU
    ``scripts/inference.py``); the SURVEY north star (pages/s on a v5e-8)
    makes this first-class here.

    Neither axis changes per-example math, so dp/tp results are identical
    to single-device (pinned by ``tests/test_dp_inference.py``). Host
    batches must pad to a multiple of the data-axis size: ``min_bucket``
    feeds ``next_bucket`` so buckets are dp * 2^k.
    """

    def __init__(self, n: int = -1, tp: int = 1, tp_rules: str = "transformer"):
        self.mesh = make_mesh(data=n, model=max(tp, 1))
        self.n = dict(self.mesh.shape)["data"]
        self._rule = (
            param_spec_rules(TP_PRESETS[tp_rules]) if tp > 1 else None
        )

    def batch(self, x):
        """Shard an array (or pytree) along its leading axis."""
        return jax.tree.map(
            lambda a: jax.device_put(a, batch_sharding(self.mesh)), x
        )

    def params(self, tree):
        """Place weights: replicated, or TP-sharded by path rules."""
        if self._rule is None:
            return jax.tree.map(
                lambda a: jax.device_put(a, replicated(self.mesh)), tree
            )
        import jax as _jax

        return _jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(
                leaf, NamedSharding(self.mesh, self._rule(path, leaf))
            ),
            tree,
        )


def setup_inference_dp(predictor, cfg) -> None:
    """Wire ``dp=<n>`` / ``tp=<m>`` from a predictor config: sets
    ``predictor._put`` (host batch placer), ``predictor.min_bucket``
    (bucket floor so shards divide evenly) and replaces nothing when both
    are unset (``_put`` is then a plain ``jnp.asarray``)."""
    import jax.numpy as jnp

    has = hasattr(cfg, "get")
    dp = int(cfg.get("dp", 0) or 0) if has else 0
    tp = int(cfg.get("tp", 0) or 0) if has else 0
    if dp or tp:
        predictor._dp = DataParallel(
            max(dp, 1), tp=max(tp, 1),
            tp_rules=str(cfg.get("tp_rules") or "transformer"),
        )
        predictor._put = predictor._dp.batch
        predictor.min_bucket = predictor._dp.n
    else:
        predictor._dp = None
        predictor._put = jnp.asarray
        predictor.min_bucket = 1


# Megatron-style tensor-parallel presets over the 'model' mesh axis:
# attention q/k/v and MLP fc1 column-parallel (shard the output dim), the
# output/fc2 projections row-parallel (shard the input dim), lm_head
# column-parallel. Substrings match kuzu.models.layers names — 'attn/q'
# also catches self_attn/cross_attn. The reference is DP-only; these make
# "TP is a config away" real: pass tp_rules=<preset> with mesh.model > 1.
TP_PRESETS: dict[str, list[tuple[str, P]]] = {
    "transformer": [
        ("attn/q/kernel", P(None, "model")),
        ("attn/k/kernel", P(None, "model")),
        ("attn/v/kernel", P(None, "model")),
        ("attn/out/kernel", P("model", None)),
        ("mlp/fc1/kernel", P(None, "model")),
        ("mlp/fc2/kernel", P("model", None)),
        ("lm_head/kernel", P(None, "model")),
    ],
}
# TrOCR (encoder+decoder blocks) and the char-MLM share the layer zoo, so
# the generic transformer rules apply verbatim.
TP_PRESETS["trocr"] = TP_PRESETS["transformer"]
TP_PRESETS["char_mlm"] = TP_PRESETS["transformer"] + [
    ("head_transform/kernel", P(None, "model")),
]


def tp_preset(name: str):
    """rule_fn for a named TP preset (see ``TP_PRESETS``)."""
    if name not in TP_PRESETS:
        raise KeyError(
            f"unknown tp preset '{name}' (have {sorted(TP_PRESETS)})"
        )
    return param_spec_rules(TP_PRESETS[name])


def param_spec_rules(rules: list[tuple[str, P]]):
    """Build a path->PartitionSpec function from (substring, spec) rules.

    The substring matches against the '/'-joined parameter path; first rule
    wins; unmatched leaves stay replicated. Used for tensor parallelism over
    the reserved ``model`` axis (the reference is DP-only; here TP is a
    config away)."""

    def rule_fn(path, leaf) -> P:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        for pattern, spec in rules:
            if pattern in name:
                # only shard when the leaf rank can hold the spec
                if len(spec) <= getattr(leaf, "ndim", 0):
                    return spec
        return P()

    return rule_fn


def state_shardings(state, mesh: Mesh, rule_fn=None):
    """NamedShardings for a TrainState-like pytree.

    ``rule_fn(path, leaf) -> PartitionSpec`` decides parameter placement
    (optimizer moments inherit it because their tree paths embed the
    parameter names); None -> everything replicated.
    """
    import jax

    def leaf_sharding(path, leaf):
        spec = rule_fn(path, leaf) if rule_fn is not None else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def force_cpu_if_requested() -> None:
    """Entrypoint bootstrap: honor ``KUZU_FORCE_CPU=1``.

    Some site configs pin ``JAX_PLATFORMS`` to the accelerator plugin (the
    env var is then ignored); ``jax.config.update`` always wins. Must run
    before first backend use."""
    if os.environ.get("KUZU_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")


def process_is_primary() -> bool:
    """Replacement for the reference's RANK in (-1, 0) guards."""
    return jax.process_index() == 0


@lru_cache(maxsize=1)
def maybe_force_cpu_mesh(n: int = 8) -> None:
    """Test helper: request ``n`` virtual CPU devices (must run pre-jax-init)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
