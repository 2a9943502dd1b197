"""Round-4 chip A/Bs, all inside ONE process (tunnel timing discipline):

1. infer: fused yolov12x e2e (fwd+decode+NMS) with stem_s2d off vs on,
   plus NMS keep-set equality between the two.
2. step: flagship train step — flash_train remat=True (the r3 default)
   vs remat=False (memory headroom trade), each measured twice to show
   in-process stability; run the whole script twice across processes to
   quantify the cross-process fusion swing with the persistent compile
   cache enabled (r3 VERDICT item 3).

Usage: python r4_ab.py [infer|step|all]
"""
import json
import sys
import time

import numpy as np

from kuzu.core.cache import enable_compilation_cache

enable_compilation_cache()


def rt_ms(reps: int = 15) -> float:
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.bfloat16)
    g = jax.jit(lambda x: x.sum())
    float(g(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) * 1e3


def ab_infer(batch: int = 8, imgsz: int = 640, reps: int = 12) -> dict:
    import jax
    import jax.numpy as jnp

    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.models.yolo.infer import run_graph
    from kuzu.ops.nms import non_max_suppression

    det = YoloDetector("yolov12x", nc=80, dtype=jnp.bfloat16, imgsz=imgsz)
    variables = det.init(jax.random.key(0), imgsz=imgsz)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    )
    rt = rt_ms()
    out = {"roundtrip_ms": rt}

    def make(s2d):
        @jax.jit
        def run(variables, imgs, c):
            feats = run_graph(det.spec, variables, imgs + c * 1e-30, stem_s2d=s2d)
            pred = det.decode(feats, imgsz=imgsz)
            o = non_max_suppression(pred, conf_thres=0.25, max_det=300)
            return o["scores"].sum() + c

        return run

    for s2d in (False, True):
        run = make(s2d)
        float(run(variables, imgs, jnp.float32(0.0)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(run(variables, imgs, jnp.float32(i)))
            ts.append(time.perf_counter() - t0)
        out[f"s2d_{s2d}_ms_per_img"] = (float(np.min(ts)) * 1e3 - rt) / batch

    # keep-set equality between the two paths
    def nms_out(s2d):
        @jax.jit
        def f(variables, imgs):
            feats = run_graph(det.spec, variables, imgs, stem_s2d=s2d)
            pred = det.decode(feats, imgsz=imgsz)
            return non_max_suppression(pred, conf_thres=0.25, max_det=300)

        return {k: np.asarray(v) for k, v in f(variables, imgs).items()}

    a, b = nms_out(False), nms_out(True)
    out["keep_count_equal"] = bool((a["valid"].sum() == b["valid"].sum()))
    va, vb = a["valid"].astype(bool), b["valid"].astype(bool)
    out["keep_boxes_allclose"] = bool(
        np.allclose(a["boxes"][va], b["boxes"][vb], atol=1.0)
    )
    print(json.dumps(out))
    return out


def ab_step() -> dict:
    from kuzu.tools.flagship import bench_train_step

    out = {}
    for name, kw in (
        ("flash_remat", dict(attn_impl="flash_train", remat=True)),
        ("flash_remat_again", dict(attn_impl="flash_train", remat=True)),
        ("flash_noremat", dict(attn_impl="flash_train", remat=False)),
    ):
        try:
            res = bench_train_step(steps=10, **kw)
            out[name] = {
                k: res[k] for k in ("step_ms", "img_per_s", "mfu", "hbm_total_gb")
                if k in res
            }
        except Exception as e:  # noqa: BLE001 — OOM expected for noremat
            out[name] = f"{type(e).__name__}: {str(e)[:120]}"
        print(json.dumps({name: out[name]}))
    return out


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("infer", "all"):
        ab_infer()
    if what in ("step", "all"):
        ab_step()
