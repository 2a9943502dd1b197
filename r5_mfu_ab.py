"""Chip A/B: flagship train-step configs toward the >=25% MFU / <=140 ms
goal (round 5, VERDICT item 4).

One process (cross-process chip variance is ±10-15%); each config runs
flagship.bench_train_step (10-step jit chain, scalar fetch, RT-amortized).
MFU here is reported two ways: `mfu` (compiled FLOPs — inflated by remat
recompute) and `mfu_model` (the remat-off model FLOPs / measured time —
the honest utilization number PERFORMANCE.md quotes).

Usage: python r5_mfu_ab.py [cfg_index ...]
"""

import json
import sys

from kuzu.core.cache import enable_compilation_cache
from kuzu.tools.flagship import bench_train_step

enable_compilation_cache()

CONFIGS = [
    dict(batch=8, remat=False),                    # r4 baseline (175.1 ms)
    dict(batch=8, remat=False, conv_impl="s2d"),   # dense-bwd downsample convs
    dict(batch=16, remat=True),                    # 2x batch, pay recompute
    dict(batch=12, remat=False),                   # fill HBM headroom
    dict(batch=12, remat=False, conv_impl="s2d"),
    dict(batch=16, remat=False),                   # expected OOM (documents edge)
]

MODEL_TFLOPS_PER_IMG = None  # derived from the first remat=False run

picks = [int(a) for a in sys.argv[1:]] or list(range(len(CONFIGS)))
results = []
for i in picks:
    kw = CONFIGS[i]
    try:
        r = bench_train_step(model="yolov12-p2x", imgsz=640, nc=1,
                             max_boxes=300, steps=10, **kw)
    except Exception as e:  # OOM configs are data, not failures
        print(json.dumps({"cfg": kw, "error": str(e)[:300]}))
        continue
    if not kw["remat"] and MODEL_TFLOPS_PER_IMG is None:  # first remat-off run
        MODEL_TFLOPS_PER_IMG = r["step_tflops"] / kw["batch"]
    if MODEL_TFLOPS_PER_IMG is not None:
        model_tflops = MODEL_TFLOPS_PER_IMG * kw["batch"]
        r["mfu_model"] = model_tflops / (r["step_ms"] / 1e3) / 197.0
    results.append(r)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in r.items()}))

best = min(results, key=lambda r: r["step_ms"] / r["batch"], default=None)
if best:
    print("best img/s/chip:", round(best["img_per_s"], 1),
          "cfg:", {k: best[k] for k in ("batch", "remat", "conv_impl")})
