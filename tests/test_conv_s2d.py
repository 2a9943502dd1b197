"""Training-path space-to-depth downsample convs (round 5, conv-backward
attack): ``Conv(impl='s2d')`` == native strided conv — values AND
gradients — with an identical param tree, for dense and grouped convs,
and through the full YoloGraph.

Reference context: the rewritten convs are the graph's downsample nodes
(``cfg/models/yolov12*.yaml`` Conv[.., 3, 2] entries); the reference's
CUDA path needs no analogue (cuDNN strided backward is native).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tree_shapes(t):
    return jax.tree.map(lambda a: a.shape, t)


@pytest.mark.parametrize("g", [1, 2, 4])
def test_s2d_conv_matches_native_fwd_and_grad(rng, g):
    from kuzu.models.yolo import modules as M

    cin, cout = 8 * g, 16 * g
    x = jnp.asarray(rng.normal(size=(2, 16, 12, cin)).astype(np.float32))
    native = M.Conv(cout, 3, 2, g=g, dtype=jnp.float32, impl="native")
    s2d = M.Conv(cout, 3, 2, g=g, dtype=jnp.float32, impl="s2d")
    v = native.init(jax.random.key(0), x, train=True)
    assert _tree_shapes(v["params"]) == _tree_shapes(
        s2d.init(jax.random.key(0), x, train=True)["params"]
    )

    def run(mod, v_):
        y, mut = mod.apply(v_, x, train=True, mutable=["batch_stats"])
        return y, mut

    y0, mut0 = run(native, v)
    y1, mut1 = run(s2d, v)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(y1), atol=2e-5, rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(mut0["batch_stats"]),
        jax.tree.leaves(mut1["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def loss(params, mod):
        y, _ = mod.apply(
            {"params": params, **{k: v[k] for k in v if k != "params"}},
            x, train=True, mutable=["batch_stats"],
        )
        return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    g0 = jax.grad(loss)(v["params"], native)
    g1 = jax.grad(loss)(v["params"], s2d)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_s2d_conv_ineligible_falls_back(rng):
    """k!=3 or s!=2 or odd spatial dims use the native path unchanged."""
    from kuzu.models.yolo import modules as M

    x = jnp.asarray(rng.normal(size=(1, 15, 15, 4)).astype(np.float32))
    for kw in ({"k": 1, "s": 1}, {"k": 3, "s": 2}):  # odd H/W blocks s2d
        a = M.Conv(8, **kw, dtype=jnp.float32, impl="s2d")
        b = M.Conv(8, **kw, dtype=jnp.float32, impl="native")
        v = b.init(jax.random.key(1), x, train=False)
        np.testing.assert_allclose(
            np.asarray(a.apply(v, x, train=False)),
            np.asarray(b.apply(v, x, train=False)),
            atol=0,
        )


def test_yolograph_conv_impl_s2d_matches_native(rng):
    """Full yolov12n graph: conv_impl='s2d' == native (f32), same params."""
    from kuzu.models.yolo.detector import YoloDetector

    kw = dict(nc=3, dtype=jnp.float32, imgsz=64)
    det0 = YoloDetector("yolov12n", **kw)
    det1 = YoloDetector("yolov12n", conv_impl="s2d", **kw)
    v = det0.init(jax.random.key(0), imgsz=64)
    assert _tree_shapes(v["params"]) == _tree_shapes(
        det1.init(jax.random.key(0), imgsz=64)["params"]
    )
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    for r, o in zip(det0.apply(v, x), det1.apply(v, x)):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(o), atol=1e-4, rtol=1e-4
        )
