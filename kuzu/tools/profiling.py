"""Profiling: layer timing, FLOPs accounting, device trace capture.

Capability parity with the reference's tracing subsystem (SURVEY §5.1):
``profile()`` per-layer FLOPs/time (``utils/torch_utils.py:639``),
``model_info`` thop-FLOPs, validator speed dicts, and ``--profile`` flags —
rebuilt on JAX primitives: compiled-HLO ``cost_analysis`` for exact FLOPs,
scalar-fetch wall timing (remote-device safe), and ``jax.profiler`` trace
capture for in-depth analysis.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def flops_of(fn: Callable, *args: Any) -> float:
    """Exact compiled-HLO FLOPs of a jittable fn (XLA cost analysis)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    return float(ca.get("flops", 0.0)) if ca else 0.0


def timed(fn: Callable, *args: Any, reps: int = 5) -> dict[str, float]:
    """Wall-time a jittable fn with remote-device-safe scalar forcing.

    Returns median/min ms and TFLOPs. The fn's outputs are reduced to one
    scalar inside the jit so the fetch forces execution (see
    .claude/skills/verify/SKILL.md on tunnel timing).
    """

    def scalarized(*a):
        out = fn(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l).astype(jnp.float32) for l in leaves)

    g = jax.jit(scalarized)
    float(g(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    fl = flops_of(fn, *args)
    return {
        "median_ms": med * 1e3,
        "min_ms": float(min(ts)) * 1e3,
        "tflops": fl / med / 1e12 if med > 0 else 0.0,
        "flops": fl,
    }


def model_info(apply_fn: Callable, variables: Any, *args: Any) -> dict[str, float]:
    """Params + FLOPs summary (reference ``model_info``)."""
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree.leaves(variables.get("params", variables))
    )
    fl = flops_of(lambda *a: apply_fn(variables, *a), *args)
    return {"params": n_params, "gflops": fl / 1e9}


@contextlib.contextmanager
def trace(log_dir: str | Path = "runs/profile"):
    """Capture a device trace viewable in XProf/TensorBoard."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Per-stage wall timing for pipelines (cascade pre/detect/recognize/post
    — the reference's Results speed fields)."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, float]:
        return {
            k: 1e3 * self.totals[k] / max(self.counts[k], 1) for k in self.totals
        }
