"""Fused inference executor parity: run_graph == YoloGraph.apply(train=False).

BN folding reassociates conv(x,w)*s into conv(x, w*s), so agreement is to
bf16 rounding on the raw head maps; decode+NMS keep-set equality is asserted
on-chip (PERFORMANCE.md "Round-2 kernel work").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CASES = ["yolov12n", "yolov8n", "yolo11n", "yolov12-p2n", "yolov10n", "yolov9c"]


@pytest.mark.parametrize("name", CASES)
def test_run_graph_matches_flax(name, rng):
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.models.yolo.infer import run_graph

    det = YoloDetector(name, nc=3, dtype=jnp.bfloat16, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = det.apply(v, x, train=False)
    out = run_graph(det.spec, v, x)
    if isinstance(ref, dict):  # v10 dual head
        assert set(ref) == set(out) == {"one2many", "one2one"}
        ref = list(ref["one2many"]) + list(ref["one2one"])
        out = list(out["one2many"]) + list(out["one2one"])
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


def test_stem_packed_matches_plain(rng):
    """Round-5 packed stem (VERDICT item 6): nodes 0+1 fused as two k2
    convs on a 4x4 space-to-depth packing — run_graph(stem_packed=True) ==
    native, same math up to summation order. yolov12n's node 1 is the
    grouped (g=2) P2 conv, so this also covers the grouped stage-B path."""
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.models.yolo.infer import run_graph

    det = YoloDetector("yolov12n", nc=3, dtype=jnp.bfloat16, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = run_graph(det.spec, v, x, stem_packed=False)
    out = run_graph(det.spec, v, x, stem_packed=True)
    for r, o in zip(ref, out):
        r32, o32 = np.asarray(r, np.float32), np.asarray(o, np.float32)
        denom = np.maximum(np.abs(r32), 1.0)
        assert (np.abs(r32 - o32) / denom).max() < 0.02


def test_stem_s2d_matches_plain(rng):
    """Space-to-depth stem rewrite (round-4): run_graph(stem_s2d=True) ==
    run_graph(stem_s2d=False) — identical math, MXU-friendlier layout; and
    decode survives bit-comparably (same argmax boxes)."""
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.models.yolo.infer import run_graph

    det = YoloDetector("yolov12n", nc=3, dtype=jnp.bfloat16, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = run_graph(det.spec, v, x, stem_s2d=False)
    out = run_graph(det.spec, v, x, stem_s2d=True)
    for r, o in zip(ref, out):
        r32, o32 = np.asarray(r, np.float32), np.asarray(o, np.float32)
        denom = np.maximum(np.abs(r32), 1.0)
        assert (np.abs(r32 - o32) / denom).max() < 0.02
    pr = np.asarray(det.decode(ref, imgsz=64))
    po = np.asarray(det.decode(out, imgsz=64))
    # same class argmax + near-identical boxes after decode
    np.testing.assert_array_equal(pr[:, 4:].argmax(1), po[:, 4:].argmax(1))
    np.testing.assert_allclose(pr[:, :4], po[:, :4], atol=0.5)


def test_fused_c3k2_kernel_matches_flax(rng):
    """Pallas fused C3k2 (interpret mode) == flax C3k2 at stem config."""
    from kuzu.models.yolo import modules as M
    from kuzu.ops.fused_c3k2 import c3k2_weights, fused_c3k2

    mod = M.C3k2(48, n=2, c3k=True, e=0.25, dtype=jnp.bfloat16)
    x = jnp.asarray(
        rng.normal(0, 1, (2, 32, 32, 24)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    v = mod.init(jax.random.key(0), x, False)
    ref = np.asarray(mod.apply(v, x, False), np.float32)
    w = c3k2_weights(v["params"], v["batch_stats"])
    out = np.asarray(
        fused_c3k2(x, tuple(w), n=2, interpret=True), np.float32
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.08, rtol=0.08)
    assert np.isclose(out, ref, atol=0.05, rtol=0.05).mean() > 0.999


def test_fused_ablock_kernel_matches_flax(rng):
    """Pallas fused ABlock (interpret) == flax ABlock."""
    from kuzu.models.yolo import modules as M
    from kuzu.ops.fused_ablock import ablock_weights, fused_ablock

    mod = M.ABlock(64, num_heads=2, mlp_ratio=1.5, area=4, dtype=jnp.bfloat16)
    x = jnp.asarray(
        rng.normal(0, 1, (2, 8, 8, 64)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    v = mod.init(jax.random.key(0), x, False)
    ref = np.asarray(mod.apply(v, x, False), np.float32)
    w = ablock_weights(v["params"], v["batch_stats"])
    from kuzu.models.yolo.infer import _P, conv

    attn_p = _P(v["params"], v["batch_stats"]).child("attn")
    vv = conv(attn_p.child("v"), x, act=False)
    pe = conv(attn_p.child("pe"), vv, g=64, act=False)
    out = np.asarray(
        fused_ablock(
            x.reshape(2, 64, 64),
            vv.reshape(2, 64, 64),
            pe.reshape(2, 64, 64),
            tuple(w), 4, 2, interpret=True,
        ).reshape(2, 8, 8, 64),
        np.float32,
    )
    np.testing.assert_allclose(out, ref, atol=0.08, rtol=0.08)
    assert np.isclose(out, ref, atol=0.05, rtol=0.05).mean() > 0.999
