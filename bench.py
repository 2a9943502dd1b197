"""Benchmark entry: prints ONE JSON line with the headline metric.

Headline: YOLOv12x end-to-end inference (forward + DFL decode + NMS) at
640px bf16 on one TPU chip — the reference's own benchmark model
(BASELINE.md: 10.38 ms/img on T4 TensorRT10). ``vs_baseline`` is that
latency ratio (>1 = faster than the reference baseline).

Timing methodology (the axon tunnel does NOT block on
``block_until_ready``; see .claude/skills/verify/SKILL.md): the iteration
loop runs *inside* one jit as a `lax.scan` whose carry perturbs the input
(prevents loop-invariant hoisting) and reduces to a scalar checksum; the
scalar fetch forces execution. The scan is compiled at TWO lengths and the
per-iteration time is the slope ``(t(n2) - t(n1)) / (n2 - n1)`` — the fixed
tunnel round-trip appears in both totals and cancels exactly, with no
separately-probed RT that could drift between probe and loop (the round-4
estimator's bias, VERDICT r4 weak #2). Reps of the two lengths interleave
so slow drift hits both mins equally.
"""

from __future__ import annotations

import json
import time

import numpy as np

T4_TENSORRT_MS_PER_IMG = 10.38  # yolov12x, BASELINE.md / yolov12 README:65


def bench_detector(
    model: str = "yolov12x",
    batch: int = 8,
    imgsz: int = 640,
    reps: int = 12,
    n1: int = 4,
    n2: int = 12,
):
    import jax
    import jax.numpy as jnp

    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.models.yolo.infer import run_graph
    from kuzu.ops.nms import non_max_suppression

    det = YoloDetector(model, nc=80, dtype=jnp.bfloat16, imgsz=imgsz)
    variables = det.init(jax.random.key(0), imgsz=imgsz)
    imgs = jnp.asarray(
        np.random.default_rng(0)
        .uniform(0, 1, (batch, imgsz, imgsz, 3))
        .astype(np.float32)
    )

    # NOTE: variables/imgs must be jit *arguments* — closed-over arrays are
    # baked into the HLO as constants and can exceed compile-request limits
    def make_run(n: int):
        @jax.jit
        def run(variables, imgs, c0):
            def body(c, _):
                # plain stem: the round-5 in-process A/B (r5_stem_ab.py,
                # slope estimator) reversed the round-4 ordering — plain
                # 2.521 vs s2d 2.656 vs packed 2.588 ms/img — so the
                # executor runs the native strided stem again (the
                # production cascade path, detector.forward_fused, too).
                feats = run_graph(det.spec, variables, imgs + c * 1e-30)
                pred = det.decode(feats, imgsz=imgsz)
                out = non_max_suppression(pred, conf_thres=0.25, max_det=300)
                # checksum feeds the next iteration's input perturbation so
                # XLA cannot hoist the body out of the scan
                return c + out["scores"].sum() * 1e-20 + 1.0, None

            c, _ = jax.lax.scan(body, c0, None, length=n)
            return c

        return run

    run1, run2 = make_run(n1), make_run(n2)
    float(run1(variables, imgs, jnp.float32(0.0)))  # compile + warm
    float(run2(variables, imgs, jnp.float32(0.0)))
    t1s, t2s = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        float(run1(variables, imgs, jnp.float32(i)))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run2(variables, imgs, jnp.float32(i)))
        t2s.append(time.perf_counter() - t0)
    # min over reps at each length (least-noise), slope cancels the RT
    ms_per_batch = max(
        (float(np.min(t2s)) - float(np.min(t1s))) * 1e3 / (n2 - n1), 1e-3
    )
    return ms_per_batch / batch


def main() -> None:
    from kuzu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    # Guard against a dead TPU tunnel: backend init hangs in a C call that
    # no in-process signal can interrupt (observed during an outage), so
    # probe device availability in a SUBPROCESS with a hard timeout and
    # emit an honest error line instead of hanging the driver.
    import subprocess
    import sys

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, timeout=300, text=True,
        )
        if probe.returncode != 0:
            raise RuntimeError(probe.stderr.strip().splitlines()[-1][:200])
        platform = probe.stdout.strip()
    except (subprocess.TimeoutExpired, RuntimeError, IndexError) as e:
        print(
            json.dumps(
                {
                    "metric": "yolov12x_640_bf16_e2e_ms_per_img",
                    "value": None,
                    "unit": "ms/img (fwd+decode+NMS, batch 8, 1 chip)",
                    "vs_baseline": None,
                    "error": f"device unavailable: {type(e).__name__}: {e}",
                }
            )
        )
        return
    ms_per_img = bench_detector()
    print(
        json.dumps(
            {
                "metric": "yolov12x_640_bf16_e2e_ms_per_img",
                "value": round(ms_per_img, 4),
                "unit": f"ms/img (fwd+decode+NMS, batch 8, 1 {platform} device)",
                "vs_baseline": round(T4_TENSORRT_MS_PER_IMG / ms_per_img, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
