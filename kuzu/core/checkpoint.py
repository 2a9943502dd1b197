"""Checkpoint / resume on orbax, with best/last tracking and partial restore.

Parity with the reference's checkpoint contract
(``yolov12/ultralytics/engine/trainer.py:513-546`` save_model /
``:692-749`` resume; Lightning ``ModelCheckpoint`` + EMA-in-ckpt
``src/callbacks/ema.py:75-98``):

- ckpt payload = {step, params, ema_params, opt_state, fitness, metadata};
- ``last`` saved every period, ``best`` tracked by a fitness scalar;
- partial restore by name+shape match, replacing the reference's
  shape-matched ``model.load(.pt)`` used for P2-head grafting
  (``scripts/train_character_detection.py:41-44``).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: ``save(step, state, fitness)`` + best/last dirs."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.best_fitness = -float("inf")
        self._ckpt = ocp.StandardCheckpointer()
        self._meta_path = self.dir / "meta.json"
        if self._meta_path.exists():
            meta = json.loads(self._meta_path.read_text())
            self.best_fitness = meta.get("best_fitness", -float("inf"))

    def _step_dir(self, name: str) -> Path:
        return self.dir / name

    def save(
        self,
        state: Any,
        fitness: float | None = None,
        metadata: dict | None = None,
        name: str = "last",
    ) -> None:
        """Save ``state`` (any pytree) to ``<dir>/<name>``; update best."""
        target = self._step_dir(name)
        tmp = self.dir / f".tmp_{name}"
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckpt.save(tmp, state)
        self._ckpt.wait_until_finished()
        if target.exists():
            shutil.rmtree(target)
        tmp.rename(target)
        meta = dict(metadata or {})
        if fitness is not None:
            meta["fitness"] = float(fitness)
        # write metadata into target BEFORE any best-copy so the best
        # checkpoint directory carries its epoch/fitness too
        (target / "kuzu_meta.json").write_text(json.dumps(meta))
        if fitness is not None and fitness >= self.best_fitness:
            self.best_fitness = float(fitness)
            best = self._step_dir("best")
            if best.exists():
                shutil.rmtree(best)
            shutil.copytree(target, best)
        self._meta_path.write_text(
            json.dumps({"best_fitness": self.best_fitness})
        )

    def restore(self, name: str = "last", like: Any | None = None) -> Any:
        """Restore a checkpoint; ``like`` provides the target pytree structure
        (with ShapeDtypeStruct or concrete leaves).

        Structure drift (e.g. a checkpoint written before a TrainState field
        existed) falls back to a raw restore + path-matched graft onto
        ``like`` — version-tolerant like the reference's shape-matched load.
        """
        target = self._step_dir(name)
        if like is None:
            return self._ckpt.restore(target)
        ref = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape")
            else x,
            like,
        )
        try:
            return self._ckpt.restore(target, ref)
        except ValueError:
            # structure drift: a dataclass field added since the checkpoint
            # was written (e.g. TrainState.model_state) is None in ``like``
            # but absent on disk — restore the present fields as a dict and
            # rebuild the dataclass around them.
            import dataclasses

            if not dataclasses.is_dataclass(like):
                raise
            present = {
                f.name: getattr(ref, f.name)
                for f in dataclasses.fields(like)
                if getattr(like, f.name) is not None
            }
            restored = self._ckpt.restore(target, present)
            return dataclasses.replace(like, **restored)

    def metadata(self, name: str = "last") -> dict:
        p = self._step_dir(name) / "kuzu_meta.json"
        return json.loads(p.read_text()) if p.exists() else {}

    def exists(self, name: str = "last") -> bool:
        return self._step_dir(name).exists()


def load_inference_params(
    mgr: CheckpointManager,
    like: Any,
    train_cfg: Any = None,
    name: str | None = None,
) -> tuple[Any, Any]:
    """Restore (params, model_state) for inference, EMA-preferred.

    LoRA-aware: a run trained with ``lora_rank`` stores a combined
    ``{"base", "lora"}`` param tree and a multi_transform opt_state that a
    typed ``like`` built from the plain optimizer cannot express — such
    checkpoints are raw-restored and the adapters fused into plain params
    (``kuzu/core/lora.py::maybe_merge``), so every predictor/validator sees
    the same tree shape as full fine-tuning. ``train_cfg`` should be the
    run's ``args.yaml`` (supplies ``lora_rank``/``lora_alpha``).
    """
    import jax.numpy as jnp

    from kuzu.core import lora as lora_lib

    if name is None:
        name = "best" if mgr.exists("best") else "last"
    cfg = train_cfg if train_cfg is not None else {}
    lora_run = bool(int(cfg.get("lora_rank", 0) or 0)) if hasattr(cfg, "get") else False
    if lora_run:
        raw = mgr.restore(name)
        src = raw.get("ema_params") or raw.get("params")
        params = jax.tree.map(jnp.asarray, lora_lib.maybe_merge(src, cfg))
        ms = raw.get("model_state") or None
        if ms is not None:
            ms = jax.tree.map(jnp.asarray, ms)
        return params, ms
    state = mgr.restore(name, like=like)
    p = state.ema_params if state.ema_params is not None else state.params
    return p, state.model_state


def _norm_path(path) -> tuple:
    """Key-type-agnostic path: dataclass attrs, dict keys and sequence
    indices all normalize to their string names."""
    out = []
    for p in path:
        for attr in ("key", "name", "idx"):
            v = getattr(p, attr, None)
            if v is not None:
                out.append(str(v))
                break
        else:
            out.append(str(p))
    return tuple(out)


def partial_load(
    target_params: Any, source_params: Any, verbose: bool = True
) -> tuple[Any, int, int]:
    """Graft shape-compatible leaves of ``source`` onto ``target`` by path.

    The rebuild of the reference's architecture-surgery load (keep only
    name+shape matching tensors). Paths compare by name, so dataclass and
    dict representations of the same tree interoperate (orbax restores
    dataclasses as dicts). Returns (params, n_loaded, n_total).
    """
    src_flat = {
        _norm_path(p): leaf
        for p, leaf in jax.tree_util.tree_flatten_with_path(source_params)[0]
    }
    tgt_flat, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    out, loaded = [], 0
    for path, leaf in tgt_flat:
        src = src_flat.get(_norm_path(path))
        if src is not None and hasattr(src, "shape") and src.shape == leaf.shape:
            out.append(np.asarray(src).astype(leaf.dtype))
            loaded += 1
        else:
            out.append(leaf)
    if verbose:
        print(f"partial_load: transferred {loaded}/{len(tgt_flat)} tensors")
    return jax.tree_util.tree_unflatten(treedef, out), loaded, len(tgt_flat)
