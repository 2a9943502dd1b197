"""Chip A/B: stem variants on the e2e headline graph (round 5, VERDICT
item 6 — break the stem plateau with layout).

Variants: plain (native convs), s2d (round-4 space-to-depth node-0
rewrite, the shipped default), packed (round-5: nodes 0+1 fused as two k2
convs on a 4x4 packing — the P1 activation lives at quarter grid with
4*C0 >= 384 lanes, never touching HBM at 96-channel/128-pad layout).

Timing: bench.py's slope estimator (two scan lengths inside jit, RT
cancels exactly); parity: identical NMS keep sets across variants.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.core.cache import enable_compilation_cache

enable_compilation_cache()

from kuzu.models.yolo.detector import YoloDetector
from kuzu.models.yolo.infer import run_graph
from kuzu.ops.nms import non_max_suppression

MODEL, B, S = "yolov12x", 8, 640
N1, N2, REPS = 4, 12, 10

det = YoloDetector(MODEL, nc=80, dtype=jnp.bfloat16, imgsz=S)
variables = det.init(jax.random.key(0), imgsz=S)
imgs = jnp.asarray(
    np.random.default_rng(0).uniform(0, 1, (B, S, S, 3)).astype(np.float32)
)
KW = {"plain": {}, "s2d": {"stem_s2d": True}, "packed": {"stem_packed": True}}


def e2e(kw, variables, imgs):
    feats = run_graph(det.spec, variables, imgs, **kw)
    pred = det.decode(feats, imgsz=S)
    return non_max_suppression(pred, conf_thres=0.25, max_det=300)


# ---- parity: same keep set across variants
outs = {}
for name, kw in KW.items():
    outs[name] = jax.jit(lambda v, x, kw=kw: e2e(kw, v, x))(variables, imgs)
ref_v = np.asarray(outs["plain"]["valid"])
ref_c = np.asarray(outs["plain"]["classes"])
for name in ("s2d", "packed"):
    v = np.asarray(outs[name]["valid"])
    c = np.asarray(outs[name]["classes"])
    same = (v == ref_v).all() and (c[ref_v.astype(bool)] == ref_c[ref_v.astype(bool)]).all()
    print(f"parity {name} vs plain: keeps {int(v.sum())}/{int(ref_v.sum())} identical={bool(same)}")


def timed(kw) -> float:
    def make(n):
        @jax.jit
        def run(variables, imgs, c0):
            def body(c, _):
                out = e2e(kw, variables, imgs + c * 1e-30)
                return c + out["scores"].sum() * 1e-20 + 1.0, None

            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c

        return run

    run1, run2 = make(N1), make(N2)
    float(run1(variables, imgs, jnp.float32(0.0)))
    float(run2(variables, imgs, jnp.float32(0.0)))
    t1s, t2s = [], []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(run1(variables, imgs, jnp.float32(i)))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run2(variables, imgs, jnp.float32(i)))
        t2s.append(time.perf_counter() - t0)
    return (float(np.min(t2s)) - float(np.min(t1s))) * 1e3 / (N2 - N1) / B


for name, kw in KW.items():
    ms = timed(kw)
    print(f"{name}: {ms:.3f} ms/img")
