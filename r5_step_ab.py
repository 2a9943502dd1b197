"""Focused steady-state A/B: flagship train step, native vs s2d downsample
convs at the production config (B=8, remat off). min-of-3 chains per
executable (the round-4 first-chain premium discipline now inside
bench_train_step), one process, compiles served from the persistent cache.
"""

import json

from kuzu.core.cache import enable_compilation_cache
from kuzu.tools.flagship import bench_train_step

enable_compilation_cache()

for conv_impl in ("native", "s2d", "native"):  # repeat baseline: order check
    r = bench_train_step(
        model="yolov12-p2x", imgsz=640, nc=1, max_boxes=300, steps=10,
        batch=8, remat=False, conv_impl=conv_impl,
    )
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in r.items()}))
