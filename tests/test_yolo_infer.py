"""Fused inference executor parity: run_graph == YoloGraph.apply(train=False).

BN folding reassociates conv(x,w)*s into conv(x, w*s), so agreement is to
bf16 rounding on the raw head maps; decode+NMS keep-set equality is asserted
on-chip (PERFORMANCE.md "Round-2 kernel work").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CASES = ["yolov12n", "yolov8n", "yolo11n", "yolov12-p2n"]


@pytest.mark.parametrize("name", CASES)
def test_run_graph_matches_flax(name, rng):
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.models.yolo.infer import run_graph

    det = YoloDetector(name, nc=3, dtype=jnp.bfloat16, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = det.apply(v, x, train=False)
    out = run_graph(det.spec, v, x)
    assert len(ref) == len(out)
    for r, o in zip(ref, out):
        assert r.shape == o.shape
        r32 = np.asarray(r, np.float32)
        o32 = np.asarray(o, np.float32)
        # bf16 rounding + BN reassociation: tight relative agreement
        denom = np.maximum(np.abs(r32), 1.0)
        assert (np.abs(r32 - o32) / denom).max() < 0.05
        # and near-exact on the vast majority of entries
        close = np.isclose(r32, o32, atol=0.05, rtol=0.05).mean()
        assert close > 0.999
