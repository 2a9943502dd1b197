"""Train-step benchmark: step time, throughput, MFU, HBM for any detector.

Measures the FULL jitted train step (forward + TAL assignment + v8 loss +
backward + optimizer + EMA + BatchNorm stats) for a named model config on
the live device — the flagship proof the reference exercises via
``scripts/train_character_detection.py:39-99`` (yolov12x P2-P5 @640, nc=1).

Remote-tunnel-safe timing: each rep fetches the loss scalar (forcing
execution through the tunnel); the fixed round-trip is measured with a
trivial jit and subtracted (see .claude/skills/verify/SKILL.md).

Usage: ``python -m kuzu.tools.train_bench model=yolov12-p2x batch=8 remat=1``
"""

from __future__ import annotations

import json
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _round_trip_ms(reps: int = 5) -> float:
    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((8,), jnp.float32)
    float(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def _synth_batch(
    batch: int, imgsz: int, max_boxes: int, n_gt: int, nc: int, seed: int = 0
) -> dict[str, np.ndarray]:
    """Synthetic page batch: dense small glyph-like boxes (kuzushiji shape)."""
    rng = np.random.default_rng(seed)
    images = rng.uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    cx = rng.uniform(0.05, 0.95, (batch, max_boxes)) * imgsz
    cy = rng.uniform(0.05, 0.95, (batch, max_boxes)) * imgsz
    w = rng.uniform(0.02, 0.06, (batch, max_boxes)) * imgsz
    h = rng.uniform(0.02, 0.06, (batch, max_boxes)) * imgsz
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    labels = rng.integers(0, nc, (batch, max_boxes))
    mask = np.zeros((batch, max_boxes), bool)
    mask[:, :n_gt] = True
    return {
        "image": images,
        "gt_boxes": boxes.astype(np.float32),
        "gt_labels": labels.astype(np.int32),
        "mask_gt": mask,
    }


def bench_train_step(
    model: str = "yolov12-p2x",
    nc: int = 1,
    imgsz: int = 640,
    batch: int = 8,
    max_boxes: int = 300,
    n_gt: int = 250,
    remat: bool = False,
    optimizer: str = "sgd",
    reps: int = 10,
    peak_tflops: float = 200.0,  # v5e bf16 measured sustained (PERFORMANCE.md)
) -> dict[str, Any]:
    from kuzu.core.config import load_config
    from kuzu.core.train import build_optimizer, init_state, make_train_step
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.detect_loss import detection_loss

    cfg = load_config(
        overrides={"optimizer": optimizer, "epochs": 100, "batch": batch}
    )
    det = YoloDetector(
        model, nc=nc, dtype=jnp.bfloat16, imgsz=imgsz, remat=remat
    )
    t0 = time.perf_counter()
    variables = det.init(jax.random.key(0), imgsz=imgsz)
    init_s = time.perf_counter() - t0
    n_params = det.param_count(variables)
    model_state = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, mstate, b, rng):
        feats, mutated = det.apply(
            {"params": params, **mstate}, b["image"], train=True,
            mutable=["batch_stats"],
        )
        total, metrics = detection_loss(
            feats, b["gt_labels"], b["gt_boxes"], b["mask_gt"],
            nc=det.nc, imgsz=imgsz, strides=tuple(det.strides),
        )
        return total, (metrics, dict(mutated))

    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = init_state(
        variables["params"], tx, use_ema=True, model_state=model_state
    )
    step = make_train_step(tx=tx, loss_fn=loss_fn, has_model_state=True)
    b = {k: jnp.asarray(v) for k, v in _synth_batch(
        batch, imgsz, max_boxes, n_gt, nc
    ).items()}
    rng = jax.random.key(1)

    t0 = time.perf_counter()
    state, metrics = step(state, b, rng)
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    rt_ms = _round_trip_ms()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = step(state, b, rng)
        float(metrics["loss"])
        ts.append(time.perf_counter() - t0)
    step_ms = float(np.median(ts)) * 1e3 - rt_ms

    try:
        ca = step.lower(state, b, rng).compile().cost_analysis()
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        flops = 0.0
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {
            "hbm_used_gb": stats.get("bytes_in_use", 0) / 2**30,
            "hbm_peak_gb": stats.get("peak_bytes_in_use", 0) / 2**30,
            "hbm_limit_gb": stats.get("bytes_limit", 0) / 2**30,
        }
    except Exception:
        pass
    out = {
        "model": model,
        "nc": nc,
        "imgsz": imgsz,
        "batch": batch,
        "remat": remat,
        "params_m": n_params / 1e6,
        "init_s": init_s,
        "compile_s": compile_s,
        "rt_ms": rt_ms,
        "step_ms": step_ms,
        "img_per_s": batch / (step_ms / 1e3) if step_ms > 0 else 0.0,
        "step_gflops": flops / 1e9,
        "tflops_per_s": flops / (step_ms / 1e3) / 1e12 if step_ms > 0 else 0.0,
        "mfu_pct": (
            flops / (step_ms / 1e3) / (peak_tflops * 1e12) * 100
            if step_ms > 0 and flops
            else 0.0
        ),
        **mem,
    }
    return out


def main(argv: list[str] | None = None) -> None:
    import sys

    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    res = bench_train_step(
        model=kv.get("model", "yolov12-p2x"),
        nc=int(kv.get("nc", 1)),
        imgsz=int(kv.get("imgsz", 640)),
        batch=int(kv.get("batch", 8)),
        max_boxes=int(kv.get("max_boxes", 300)),
        n_gt=int(kv.get("n_gt", 250)),
        remat=kv.get("remat", "0") not in ("0", "false", "False"),
        optimizer=kv.get("optimizer", "sgd"),
        reps=int(kv.get("reps", 10)),
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
