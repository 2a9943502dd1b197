"""SAM2-lite: memory-conditioned video segmentation (reference
``yolov12/ultralytics/models/sam/modules/sam.py:105`` ``SAM2Model``,
``memory_attention.py``, ``SAM2VideoPredictor`` in ``sam/predict.py``).

Checks the TPU-native re-anatomy: fixed-shape ring-buffer memory bank
carried through one ``lax.scan`` over frames, validity-masked memory
cross-attention, object pointers, batch-lanes-as-objects.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_sam2():
    from kuzu.models.sam2 import SAM2, SAM2VideoPredictor

    m = SAM2(
        img_size=64, dim=64, mem_dim=32, enc_depth=2, enc_heads=4,
        dec_heads=4, mem_depth=1, mem_frames=4, max_ptrs=4,
    )
    pred = SAM2VideoPredictor.create(
        m, jax.random.key(0), clip_shape=(2, 2), num_points=1
    )
    return m, pred


def _clip(b, t, s=64, seed=1):
    return jax.random.uniform(jax.random.key(seed), (b, t, s, s, 3))


def test_single_frame_contract(tiny_sam2):
    """``__call__`` keeps the SAM single-image contract on track-inited
    variables (shared encoder/decoder params)."""
    m, pred = tiny_sam2
    pts = jnp.array([[[0.5, 0.5]], [[0.3, 0.7]]])
    lbl = jnp.ones((2, 1), jnp.int32)
    masks, iou = m.apply(pred.variables, _clip(2, 1)[:, 0], pts, lbl)
    assert masks.shape == (2, 3, 16, 16)
    assert iou.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(masks)))


def test_track_shapes_and_ring_overflow(tiny_sam2):
    """A clip LONGER than the memory ring (T=6 > M=4) tracks in one scan;
    outputs stay finite as old slots are overwritten."""
    m, pred = tiny_sam2
    frames = _clip(2, 6)
    pts = jnp.array([[[0.5, 0.5]], [[0.25, 0.25]]])
    lbl = jnp.ones((2, 1), jnp.int32)
    masks, iou = pred.predict(frames, pts, lbl)
    assert masks.shape == (2, 6, 16, 16)
    assert iou.shape == (2, 6)
    assert np.all(np.isfinite(np.asarray(masks)))
    assert np.all(np.isfinite(np.asarray(iou)))


def test_memory_conditions_later_frames(tiny_sam2):
    """Later frames must actually READ the memory bank: tracking the same
    frame at t=1 after two different first frames gives different masks,
    while an empty bank (no-mem placeholder path at t=0) is prompt-only."""
    m, pred = tiny_sam2
    shared = _clip(1, 1, seed=7)[:, 0]
    a = jnp.stack([_clip(1, 1, seed=2)[:, 0], shared], axis=1)
    b = jnp.stack([_clip(1, 1, seed=3)[:, 0], shared], axis=1)
    pts = jnp.array([[[0.5, 0.5]]])
    lbl = jnp.ones((1, 1), jnp.int32)
    ma, _ = pred.predict(a, pts, lbl)
    mb, _ = pred.predict(b, pts, lbl)
    # frame 1 is identical pixels in both clips; only the memory differs
    assert not np.allclose(np.asarray(ma[:, 1]), np.asarray(mb[:, 1]))


def test_batch_lanes_are_independent_objects(tiny_sam2):
    """Objects are batch lanes: lane 0's result is invariant to what lane 1
    tracks (no cross-lane leakage through the bank or attention)."""
    m, pred = tiny_sam2
    f0 = _clip(1, 3, seed=11)
    f1a, f1b = _clip(1, 3, seed=12), _clip(1, 3, seed=13)
    pts = jnp.array([[[0.5, 0.5]], [[0.2, 0.8]]])
    lbl = jnp.ones((2, 1), jnp.int32)
    ma, _ = pred.predict(jnp.concatenate([f0, f1a]), pts, lbl)
    mb, _ = pred.predict(jnp.concatenate([f0, f1b]), pts, lbl)
    np.testing.assert_allclose(
        np.asarray(ma[0]), np.asarray(mb[0]), rtol=0, atol=1e-5
    )


def test_track_is_deterministic(tiny_sam2):
    m, pred = tiny_sam2
    frames = _clip(2, 3)
    pts = jnp.array([[[0.5, 0.5]], [[0.25, 0.25]]])
    lbl = jnp.ones((2, 1), jnp.int32)
    m1, i1 = pred.predict(frames, pts, lbl)
    m2, i2 = pred.predict(frames, pts, lbl)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
