"""Round-4 step A/B follow-up (fresh process):

1. flash_remat repeat — cross-process reproducibility of the r4 step
   measurement with the persistent compile cache warm.
2. flash_noremat at the PRODUCTION char-det config (max_boxes=400) —
   decides whether the production train stage can drop remat (the r4 A/B
   measured 175.1 ms vs 231-310 ms remat at max_boxes=300).
"""
import json

from kuzu.core.cache import enable_compilation_cache

enable_compilation_cache()

from kuzu.tools.flagship import bench_train_step  # noqa: E402

for name, kw in (
    ("flash_remat_p2", dict(attn_impl="flash_train", remat=True)),
    ("flash_noremat_mb400", dict(attn_impl="flash_train", remat=False, max_boxes=400)),
):
    try:
        res = bench_train_step(steps=10, **kw)
        out = {k: res[k] for k in ("step_ms", "img_per_s", "mfu", "hbm_total_gb") if k in res}
    except Exception as e:  # noqa: BLE001 — OOM is a valid negative result
        out = f"{type(e).__name__}: {str(e)[:160]}"
    print(json.dumps({name: out}), flush=True)
