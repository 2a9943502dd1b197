"""LoRA / PEFT: low-rank adapter fine-tuning as a first-class trainer feature.

TPU-native replacement for the reference's VLM LoRA-SFT recipe
(``scripts/qwen3_vl_cft_sft.py``: unsloth ``get_peft_model(r=16)`` + TRL
``SFTTrainer`` on a 4-bit torch VLM). The reference reaches for an external
PEFT stack because torch fine-tuning of a frozen multi-billion-param model
needs custom kernels; under JAX the same thing is a *parameter
transformation*, not a model surgery:

- adapters are an extra pytree ``{path: {"a": (d_in, r), "b": (r, d_out)}}``
  next to the frozen base params;
- the merged weight ``W + (alpha/r) * a @ b`` is computed inside the jitted
  train step (a rank-r matmul per target — noise next to the model FLOPs);
- the base tree rides through ``jax.lax.stop_gradient`` so XLA prunes its
  entire backward cone; the optimizer runs under ``optax.multi_transform``
  so moments exist only for the adapters.

Any kuzu trainer gains this via ``lora_rank=<r>`` in the config
(``BaseTrainer`` wires it generically); ``lora_alpha`` (default ``2*rank``)
and ``lora_targets`` (regex over ``.``-joined param paths, default: every
2-D ``kernel``) tune the usual knobs. Checkpoints store the combined
``{"base", "lora"}`` tree, so resume just works; predictors call
``maybe_merge`` to fuse adapters at load time.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

# every 2-D matmul weight: attention q/k/v/out, MLP fc1/fc2, projections,
# lm_head — flax Dense kernels are (d_in, d_out); embeddings ('embedding')
# and conv kernels (4-D) are excluded by name/rank
DEFAULT_TARGETS = r"(^|\.)kernel$"


def _path_str(path) -> str:
    # '.'-joined (not '/'): these strings become dict keys in the adapter
    # tree, and '/' inside a key would collide with orbax's storage paths
    parts = []
    for p in path:
        for attr in ("key", "name", "idx"):
            v = getattr(p, attr, None)
            if v is not None:
                parts.append(str(v))
                break
        else:
            parts.append(str(p))
    return ".".join(parts)


def _match_fn(targets: str | None) -> Callable[[str, Any], bool]:
    pat = re.compile(targets or DEFAULT_TARGETS)
    return lambda path, leaf: (
        getattr(leaf, "ndim", 0) == 2 and pat.search(path) is not None
    )


def is_lora_tree(params: Any) -> bool:
    """True for the combined ``{"base": ..., "lora": ...}`` param tree."""
    return (
        isinstance(params, dict)
        and set(params.keys()) == {"base", "lora"}
        and isinstance(params.get("lora"), dict)
    )


def init_lora(
    rng: jax.Array,
    params: Any,
    rank: int,
    targets: str | None = None,
    dtype: Any = jnp.float32,
) -> dict[str, dict[str, jnp.ndarray]]:
    """Build the adapter tree for every matched 2-D kernel in ``params``.

    ``a`` ~ N(0, 1/rank) and ``b`` = 0 (the LoRA paper's init), so the
    merged model starts exactly at the base weights.
    """
    match = _match_fn(targets)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    hits = [(p, l) for p, l in flat if match(_path_str(p), l)]
    if not hits:
        raise ValueError(
            f"lora: no parameters matched targets={targets or DEFAULT_TARGETS!r}"
        )
    keys = jax.random.split(rng, len(hits))
    out: dict[str, dict[str, jnp.ndarray]] = {}
    for k, (path, leaf) in zip(keys, hits):
        d_in, d_out = leaf.shape
        out[_path_str(path)] = {
            "a": jax.random.normal(k, (d_in, rank), dtype) / np.sqrt(rank),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    return out


def merge_lora(base: Any, lora: dict, alpha: float) -> Any:
    """``W + (alpha/rank) * a @ b`` for every adapted leaf; passthrough rest.

    Differentiable w.r.t. ``lora``; callers freeze ``base`` by passing it
    through ``jax.lax.stop_gradient`` first (BaseTrainer does).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(base)
    out = []
    for path, leaf in flat:
        ab = lora.get(_path_str(path))
        if ab is None:
            out.append(leaf)
        else:
            rank = ab["a"].shape[1]
            delta = (alpha / rank) * (
                ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)
            )
            out.append((leaf.astype(jnp.float32) + delta).astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def combine(base: Any, lora: dict) -> dict:
    """The trainable tree: frozen base + adapters, one pytree."""
    return {"base": base, "lora": lora}


def resolve_alpha(cfg: Any, rank: int) -> float:
    a = cfg.get("lora_alpha") if hasattr(cfg, "get") else None
    return float(a) if a not in (None, "", 0, "None") else 2.0 * rank


def maybe_merge(params: Any, cfg: Any = None) -> Any:
    """Fuse adapters if ``params`` is a combined LoRA tree, else passthrough.

    Predictor/export entry: a raw-restored LoRA checkpoint fuses into a
    plain param tree indistinguishable from full fine-tuning.
    """
    if not is_lora_tree(params):
        return params
    rank = next(iter(params["lora"].values()))["a"].shape[1]
    alpha = resolve_alpha(cfg, rank) if cfg is not None else 2.0 * rank
    return merge_lora(params["base"], params["lora"], alpha)


def label_tree(params: dict) -> dict:
    """'freeze'/'train' labels for ``optax.multi_transform`` over the
    combined tree — optimizer moments exist only for the adapters."""
    return {
        "base": jax.tree.map(lambda _: "freeze", params["base"]),
        "lora": jax.tree.map(lambda _: "train", params["lora"]),
    }


def trainable_count(params: dict) -> tuple[int, int]:
    """(trainable, total) parameter counts for the combined tree."""
    n = lambda t: sum(int(np.prod(p.shape)) for p in jax.tree.leaves(t))
    return n(params["lora"]), n(params["base"]) + n(params["lora"])
