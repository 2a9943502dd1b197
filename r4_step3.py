"""Round-4 step steady-state probe: every executable is now in the
persistent cache; run each noremat config TWICE in one process — the r4
finding is that the first 10-step chained run carries a ~80 ms/step
premium (device-side warmup) and the repeat is the steady state.
"""
import json

from kuzu.core.cache import enable_compilation_cache

enable_compilation_cache()

from kuzu.tools.flagship import bench_train_step  # noqa: E402

for name, kw in (
    ("noremat_a", dict(attn_impl="flash_train", remat=False)),
    ("noremat_b", dict(attn_impl="flash_train", remat=False)),
    ("noremat_mb400_a", dict(attn_impl="flash_train", remat=False, max_boxes=400)),
    ("noremat_mb400_b", dict(attn_impl="flash_train", remat=False, max_boxes=400)),
):
    res = bench_train_step(steps=10, **kw)
    out = {k: res[k] for k in ("step_ms", "img_per_s", "mfu", "hbm_total_gb") if k in res}
    print(json.dumps({name: out}), flush=True)
