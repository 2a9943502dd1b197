import jax.numpy as jnp
import numpy as np
import pytest

from kuzu.ops.nms import nms_padded, non_max_suppression


def _rand_boxes(rng, n, scale=100.0):
    xy = rng.uniform(0, scale, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(5, 30, size=(n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], axis=-1)


def test_nms_suppresses_duplicates():
    boxes = jnp.array(
        [[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    classes = jnp.zeros(3, jnp.int32)
    valid = jnp.ones(3, bool)
    b, s, c, v = nms_padded(boxes, scores, classes, valid, iou_threshold=0.5, max_det=3)
    v = np.asarray(v)
    assert v.sum() == 2
    np.testing.assert_allclose(np.asarray(s)[:2], [0.9, 0.7])


def test_nms_class_aware():
    boxes = jnp.array([[0.0, 0, 10, 10], [1, 1, 11, 11]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8])
    classes = jnp.array([0, 1], jnp.int32)
    valid = jnp.ones(2, bool)
    _, _, _, v = nms_padded(boxes, scores, classes, valid, max_det=2)
    assert np.asarray(v).sum() == 2  # different classes never suppress
    _, _, _, v = nms_padded(boxes, scores, classes, valid, max_det=2, agnostic=True)
    assert np.asarray(v).sum() == 1


def _greedy_nms_np(boxes, scores, thr):
    """Straightforward O(N^2) greedy NMS golden (torchvision.ops.nms semantics)."""
    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(len(boxes), bool)
    from kuzu.core.metrics import box_iou_np

    iou = box_iou_np(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thr
        suppressed[i] = True
    return np.array(keep)


def test_nms_matches_golden(rng):
    n = 200
    boxes = _rand_boxes(rng, n)
    scores = rng.uniform(0.3, 1.0, size=n).astype(np.float32)
    # make scores unique so ordering is deterministic across impls
    scores = np.sort(scores)[::-1].copy()
    keep_ref = _greedy_nms_np(boxes, scores, 0.5)
    b, s, c, v = nms_padded(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool),
        iou_threshold=0.5,
        score_threshold=0.0,
        max_det=n,
        max_nms=n,
    )
    ours = np.asarray(s)[np.asarray(v)]
    ref_scores = scores[keep_ref]
    np.testing.assert_allclose(np.sort(ours), np.sort(ref_scores), atol=1e-6)
    assert len(ours) == len(keep_ref)


def test_batched_nms_shapes(rng):
    b_sz, nc, a = 2, 3, 64
    pred = jnp.asarray(rng.normal(size=(b_sz, 4 + nc, a)).astype(np.float32))
    # make boxes sane xywh and scores in [0,1]
    pred = pred.at[:, :4].set(jnp.abs(pred[:, :4]) * 20 + 5)
    pred = pred.at[:, 4:].set(jnp.asarray(rng.uniform(0, 1, size=(b_sz, nc, a))))
    out = non_max_suppression(pred, conf_thres=0.25, max_det=32, max_nms=64)
    assert out["boxes"].shape == (b_sz, 32, 4)
    assert out["scores"].shape == (b_sz, 32)
    assert out["classes"].dtype == jnp.int32
    assert out["valid"].dtype == bool
    s = np.asarray(out["scores"])
    # scores are descending within valid region
    for i in range(b_sz):
        vi = np.asarray(out["valid"][i])
        si = s[i][vi]
        assert (np.diff(si) <= 1e-6).all()
        assert (si > 0.25).all()


def test_nms_max_det_pad():
    boxes = jnp.array([[0.0, 0, 10, 10]])
    scores = jnp.array([0.9])
    b, s, c, v = nms_padded(
        boxes, scores, jnp.zeros(1, jnp.int32), jnp.ones(1, bool), max_det=8
    )
    assert b.shape == (8, 4) and np.asarray(v).sum() == 1
