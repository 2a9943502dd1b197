import jax.numpy as jnp
import numpy as np
import pytest

from kuzu.ops import (
    bbox_iou,
    box_iou_matrix,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)


def test_xywh_roundtrip(rng):
    xywh = jnp.asarray(rng.uniform(1, 100, size=(32, 4)).astype(np.float32))
    back = xyxy2xywh(xywh2xyxy(xywh))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xywh), rtol=1e-5)


def test_iou_matrix_known_values():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou_matrix(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-5)


def test_bbox_iou_matches_matrix(rng):
    a = rng.uniform(0, 50, size=(16, 2)).astype(np.float32)
    boxes1 = np.concatenate([a, a + rng.uniform(1, 50, size=(16, 2))], -1)
    b = rng.uniform(0, 50, size=(16, 2)).astype(np.float32)
    boxes2 = np.concatenate([b, b + rng.uniform(1, 50, size=(16, 2))], -1)
    elem = np.asarray(bbox_iou(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    mat = np.asarray(box_iou_matrix(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    np.testing.assert_allclose(elem, np.diag(mat), atol=1e-5)


def test_ciou_le_iou(rng):
    a = rng.uniform(0, 50, size=(8, 2)).astype(np.float32)
    boxes1 = np.concatenate([a, a + rng.uniform(1, 50, size=(8, 2))], -1)
    b = rng.uniform(0, 50, size=(8, 2)).astype(np.float32)
    boxes2 = np.concatenate([b, b + rng.uniform(1, 50, size=(8, 2))], -1)
    iou = np.asarray(bbox_iou(jnp.asarray(boxes1), jnp.asarray(boxes2)))
    ciou = np.asarray(bbox_iou(jnp.asarray(boxes1), jnp.asarray(boxes2), ciou=True))
    assert (ciou <= iou + 1e-6).all()
    # identical boxes: CIoU == IoU == 1
    same = np.asarray(bbox_iou(jnp.asarray(boxes1), jnp.asarray(boxes1), ciou=True))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)


def _ciou_np(b1, b2):
    """Numpy CIoU golden (Zheng et al. 2020 formula)."""
    x11, y11, x12, y12 = b1.T
    x21, y21, x22, y22 = b2.T
    w1, h1, w2, h2 = x12 - x11, y12 - y11, x22 - x21, y22 - y21
    iw = np.clip(np.minimum(x12, x22) - np.maximum(x11, x21), 0, None)
    ih = np.clip(np.minimum(y12, y22) - np.maximum(y11, y21), 0, None)
    inter = iw * ih
    union = w1 * h1 + w2 * h2 - inter + 1e-7
    iou = inter / union
    cw = np.maximum(x12, x22) - np.minimum(x11, x21)
    ch = np.maximum(y12, y22) - np.minimum(y11, y21)
    c2 = cw**2 + ch**2 + 1e-7
    rho2 = ((x21 + x22 - x11 - x12) ** 2 + (y21 + y22 - y11 - y12) ** 2) / 4
    v = 4 / np.pi**2 * (np.arctan(w2 / (h2 + 1e-7)) - np.arctan(w1 / (h1 + 1e-7))) ** 2
    alpha = np.where(v > 0, v / np.maximum(v - iou + 1 + 1e-7, 1e-7), 0.0)
    return iou - (rho2 / c2 + v * alpha)


def test_bbox_ciou_vs_numpy_golden(rng):
    a = rng.uniform(0, 50, size=(32, 2)).astype(np.float32)
    boxes1 = np.concatenate([a, a + rng.uniform(1, 50, size=(32, 2))], -1)
    b = rng.uniform(0, 50, size=(32, 2)).astype(np.float32)
    boxes2 = np.concatenate([b, b + rng.uniform(1, 50, size=(32, 2))], -1)
    ours = np.asarray(bbox_iou(jnp.asarray(boxes1), jnp.asarray(boxes2), ciou=True))
    np.testing.assert_allclose(ours, _ciou_np(boxes1, boxes2), atol=2e-4)


def test_scale_and_clip():
    # 640x640 letterboxed from a 1280x960 original: gain=0.5, pad_x=80
    boxes = jnp.array([[80.0, 0.0, 580.0, 640.0]])
    out = np.asarray(scale_boxes(boxes, (640, 640), (1280, 960)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 960.0, 1280.0]], atol=1e-4)
    clipped = np.asarray(clip_boxes(jnp.array([[-5.0, -5, 2000, 2000]]), (100, 200)))
    np.testing.assert_allclose(clipped, [[0.0, 0, 200, 100]])
