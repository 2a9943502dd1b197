"""Chip A/B: batched vs chunked vs full-tile Pallas NMS kernel (round 4).

Timing per the verify-skill methodology: the rep loop is a `lax.scan`
inside one jit whose carry perturbs the scores (prevents hoisting) and
reduces to a scalar; two scan lengths cancel the ~25 ms tunnel RT.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.ops.pallas_nms import pallas_suppress

B, K = 8, 2048
rng = np.random.default_rng(0)
cx, cy = rng.uniform(50, 600, (2, B, K))
w, h = rng.uniform(5, 80, (2, B, K))
boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
scores = rng.uniform(size=(B, K)).astype(np.float32)
order = np.argsort(-scores, 1)
boxes = np.take_along_axis(boxes.astype(np.float32), order[..., None], 1)
valid_np = rng.uniform(size=(B, K)) > 0.1

boxes_d = jnp.asarray(boxes)
valid_d = jnp.asarray(valid_np)

# --- parity on chip (every variant vs the full-tile kernel — ADVICE r4:
# 'chunked' was timed but never parity-checked on real hardware)
a = np.asarray(pallas_suppress(boxes_d, valid_d, 0.45, variant="full"))
for other in ("batched", "chunked"):
    b = np.asarray(pallas_suppress(boxes_d, valid_d, 0.45, variant=other))
    print(f"keeps full/{other}:", a.sum(), b.sum(), "identical:", bool((a == b).all()))
    assert (a == b).all(), f"{other} kernel diverged from the full-tile kernel"


def timed(variant: str, n: int) -> float:
    @jax.jit
    def run(bx, va):
        def step(c, _):
            keep = pallas_suppress(bx + c * 1e-30, va, 0.45, variant=variant)
            return c + keep.sum().astype(jnp.float32), 0.0

        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=n)
        return out

    float(run(boxes_d, valid_d))  # compile + warm
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(run(boxes_d, valid_d))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


for name in ["chunked", "batched"]:
    t_short, t_long = timed(name, 4), timed(name, 20)
    per = (t_long - t_short) / 16 * 1e3
    print(f"{name}: {per:.3f} ms per batched suppress (B={B}, K={K})")
