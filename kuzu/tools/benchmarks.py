"""Benchmark harness: model/batch/precision matrix timing.

Capability parity with the reference ``utils/benchmarks.py`` (583 LoC format
matrix) reshaped for TPU: instead of timing export formats (ONNX/TRT/...)
the matrix spans model scales, batch sizes and dtypes on the live device,
plus the exported-StableHLO artifact. Uses the remote-safe timing from
``kuzu.tools.profiling``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.tools.profiling import timed


def benchmark_detectors(
    scales: tuple[str, ...] = ("yolov12n", "yolov12s"),
    batches: tuple[int, ...] = (1, 8),
    imgsz: int = 640,
    dtype: Any = jnp.bfloat16,
    include_nms: bool = True,
    nc: int = 80,
) -> list[dict]:
    """Per (model, batch): median ms, ms/img, TFLOPs. Printable table rows."""
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.nms import non_max_suppression

    rows = []
    for scale in scales:
        det = YoloDetector(scale, nc=nc, dtype=dtype, imgsz=imgsz)
        variables = det.init(jax.random.key(0), imgsz=imgsz)
        n_params = det.param_count(variables)
        for b in batches:
            imgs = jnp.zeros((b, imgsz, imgsz, 3), jnp.float32)

            def fwd(variables, imgs):
                feats = det.infer(variables, imgs)
                pred = det.decode(feats, imgsz=imgsz)
                if include_nms:
                    return non_max_suppression(pred, conf_thres=0.25, max_det=300)
                return pred

            t = timed(fwd, variables, imgs, reps=5)
            rows.append(
                {
                    "model": scale,
                    "batch": b,
                    "params_m": round(n_params / 1e6, 2),
                    "median_ms": round(t["median_ms"], 2),
                    "ms_per_img": round(t["median_ms"] / b, 3),
                    "tflops": round(t["tflops"], 1),
                }
            )
    return rows


def benchmark_model(model, batches: tuple[int, ...] = (1, 8), **kwargs) -> dict:
    """``Model.benchmark()`` entry: times the facade's own architecture.

    A trained-run directory resolves to its architecture via args.yaml."""
    from pathlib import Path

    spec = str(model.model_spec)
    run_args = Path(spec) / "args.yaml"
    if run_args.exists():
        from kuzu.core.config import load_config

        spec = str(load_config(run_args).get("model") or "yolov12n")
    rows = benchmark_detectors(scales=(spec,), batches=batches, **kwargs)
    return {"rows": rows}


def format_table(rows: list[dict]) -> str:
    if not rows:
        return "(no results)"
    keys = list(rows[0])
    widths = {k: max(len(k), *(len(str(r[k])) for r in rows)) for k in keys}
    header = "  ".join(k.ljust(widths[k]) for k in keys)
    lines = [header, "-" * len(header)]
    for r in rows:
        lines.append("  ".join(str(r[k]).ljust(widths[k]) for k in keys))
    return "\n".join(lines)
