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
