import json
from kuzu.tools.flagship import bench_train_step

for impl in ("einsum", "flash_train"):
    res = bench_train_step(attn_impl=impl, remat=True, steps=10)
    res["attn_impl"] = impl
    print(json.dumps(res))
