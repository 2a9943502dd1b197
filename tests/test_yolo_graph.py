"""Graph compiler parity: parameter counts vs published reference models.

The 16-param delta on every model is the reference's frozen DFL conv, which
kuzu computes as a free einsum (``modules.dfl_expectation``).
"""

import jax
import jax.numpy as jnp
import pytest

CASES = [
    # (spec, nc, reference params)
    ("yolov12n", 80, 2_553_904),
    ("yolov12s", 80, 9_127_424),
    ("yolov8n", 80, 3_157_200),
    ("yolo11n", 80, 2_624_080),
    ("yolo11s", 80, 9_458_752),
    # v10: the dual head shares one DFL conv in the reference, still -16
    ("yolov10n", 80, 2_775_520),
    ("yolov10s", 80, 8_128_272),
    ("yolov9c", 80, 25_590_912),
]


@pytest.mark.parametrize("name,nc,ref", CASES)
def test_param_count_parity(name, nc, ref):
    from kuzu.models.yolo.detector import YoloDetector

    det = YoloDetector(name, nc=nc)
    v = det.init(jax.random.key(0), imgsz=64)
    assert det.param_count(v) == ref - 16  # DFL conv is an einsum here


def test_v8_uses_legacy_head_v12_does_not():
    from kuzu.models.yolo.detector import YoloDetector

    assert YoloDetector("yolov8n", nc=2).spec.legacy_head
    assert not YoloDetector("yolov12n", nc=2).spec.legacy_head


def test_v8_forward_and_decode():
    from kuzu.models.yolo.detector import YoloDetector

    det = YoloDetector("yolov8n", nc=3, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    feats = det.apply(v, jnp.zeros((2, 64, 64, 3)))
    assert [f.shape for f in feats] == [(2, 8, 8, 67), (2, 4, 4, 67), (2, 2, 2, 67)]
    pred = det.decode(feats, imgsz=64)
    assert pred.shape == (2, 7, 84)


def test_p2_variant_strides():
    from kuzu.models.yolo.detector import YoloDetector

    det = YoloDetector("yolov12-p2x", nc=1)
    assert det.strides == [4, 8, 16, 32]


def test_v10_dual_head_forward_decode_and_nms_free():
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.nms import nms_free_select
    from kuzu.ops.detect_loss import e2e_detection_loss

    det = YoloDetector("yolov10n", nc=3, imgsz=64)
    assert det.spec.end2end
    v = det.init(jax.random.key(0), imgsz=64)
    feats = det.apply(v, jnp.zeros((2, 64, 64, 3)))
    assert set(feats) == {"one2many", "one2one"}
    assert [f.shape for f in feats["one2one"]] == [
        (2, 8, 8, 67), (2, 4, 4, 67), (2, 2, 2, 67)
    ]
    pred = det.decode(feats, imgsz=64)  # uses one2one
    assert pred.shape == (2, 7, 84)
    out = nms_free_select(pred, conf_thres=0.0, max_det=10)
    assert out["boxes"].shape == (2, 10, 4)
    assert out["valid"].dtype == bool

    # dual loss: finite scalar + grads flow (one2one sees detached feats)
    import numpy as np

    gt_l = jnp.zeros((2, 4), jnp.int32)
    gt_b = jnp.asarray(
        np.tile(np.array([[4.0, 4, 20, 30]], np.float32), (2, 4, 1))
    )
    mask = jnp.asarray(np.array([[1, 0, 0, 0]] * 2, bool))

    def loss(params):
        f = det.apply({**v, "params": params}, jnp.zeros((2, 64, 64, 3)))
        total, _ = e2e_detection_loss(
            f, gt_l, gt_b, mask, nc=3, imgsz=64,
            strides=tuple(det.strides),
        )
        return total

    val, grads = jax.value_and_grad(loss)(v["params"])
    assert bool(jnp.isfinite(val))
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)


def test_nms_free_select_picks_top_scores():
    from kuzu.ops.nms import nms_free_select
    import numpy as np

    nc, A = 3, 50
    pred = np.zeros((1, 4 + nc, A), np.float32)
    pred[0, :4, 7] = [30, 30, 10, 10]
    pred[0, 4 + 1, 7] = 0.9
    pred[0, :4, 20] = [10, 10, 6, 6]
    pred[0, 4 + 2, 20] = 0.6
    out = nms_free_select(jnp.asarray(pred), conf_thres=0.25, max_det=5)
    v = np.asarray(out["valid"][0])
    assert v.sum() == 2
    assert list(np.asarray(out["classes"][0])[v]) == [1, 2]
    np.testing.assert_allclose(
        np.asarray(out["scores"][0])[v], [0.9, 0.6], atol=1e-6
    )


def test_reg_max_override_head_loss_decode():
    """reg_max is configurable end-to-end (the reference hardcodes 16,
    ``nn/modules/head.py`` Detect.reg_max): a 32-bin head emits
    4*32+nc channels, the loss consumes it, and decode can express box
    extents beyond the 16-bin ceiling."""
    import numpy as np

    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.detect_loss import detection_loss

    det = YoloDetector("yolov8n", nc=2, imgsz=64, reg_max=32)
    assert det.spec.reg_max == 32
    variables = det.init(jax.random.key(0), imgsz=64)
    feats = det.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert feats[0].shape[-1] == 4 * 32 + 2

    gt_boxes = jnp.asarray([[[2.0, 2.0, 62.0, 62.0]]])  # tall/wide box
    total, metrics = detection_loss(
        feats, jnp.zeros((1, 1), jnp.int32), gt_boxes,
        jnp.ones((1, 1), bool), nc=2, imgsz=64, strides=tuple(det.strides),
        reg_max=32,
    )
    assert np.isfinite(float(total))

    # decode ceiling: saturate one anchor's DFL logits at the top bin on
    # all four sides -> expected extent ~31 grid units * stride, beyond
    # the 15-unit ceiling of reg_max=16
    f = [np.zeros(np.asarray(x).shape, np.float32) for x in feats]
    hot = np.full((4, 32), -20.0, np.float32)
    hot[:, 31] = 20.0
    f[2][0, 0, 0, : 4 * 32] = hot.reshape(-1)  # stride-32 level
    pred = det.decode([jnp.asarray(x) for x in f])  # (B, 4+nc, A)
    wh = np.asarray(pred[0, 2:4, :])
    assert wh.max() >= 2 * 30 * 32  # ~2*31*32 px, far past 2*15*32
