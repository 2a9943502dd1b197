import jax.numpy as jnp
import numpy as np

from kuzu.ops.letterbox import (
    KUZUSHIJI_MEAN,
    KUZUSHIJI_STD,
    letterbox,
    normalize_image,
    resize_keep_aspect,
)


def test_letterbox_shape_and_fill(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(30, 60, 3)).astype(np.float32))
    canvas, gain, pad = letterbox(img, 64, 64, fill=114 / 255)
    assert canvas.shape == (64, 64, 3)
    # gain = min(64/30, 64/60) = 64/60
    np.testing.assert_allclose(float(gain), 64 / 60, rtol=1e-5)
    c = np.asarray(canvas)
    # top rows are pure fill (content height = 32, pad_y = 16)
    np.testing.assert_allclose(c[:15], 114 / 255, atol=1e-5)
    np.testing.assert_allclose(c[-15:], 114 / 255, atol=1e-5)
    assert not np.allclose(c[32], 114 / 255)


def test_letterbox_identity_when_same_size(rng):
    img = jnp.asarray(rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32))
    canvas, gain, pad = letterbox(img, 32, 32)
    np.testing.assert_allclose(np.asarray(canvas), np.asarray(img), atol=1e-5)
    np.testing.assert_allclose(float(gain), 1.0)
    np.testing.assert_allclose(np.asarray(pad), 0.0)


def test_resize_keep_aspect_top_left(rng):
    # tall column image resized to 64-wide, 128-tall canvas, white fill
    img = jnp.zeros((100, 25, 3), jnp.float32)  # black content
    canvas, gain = resize_keep_aspect(img, 128, 64)
    c = np.asarray(canvas)
    assert canvas.shape == (128, 64, 3)
    np.testing.assert_allclose(float(gain), 1.28, rtol=1e-5)
    assert c[:127, :31].max() < 0.5  # content region dark (anchored top-left)
    np.testing.assert_allclose(c[:, 40:], 1.0, atol=1e-5)  # right pad white


def test_normalize_image():
    img = jnp.ones((4, 4, 3), jnp.float32) * 0.5
    out = np.asarray(normalize_image(img, KUZUSHIJI_MEAN, KUZUSHIJI_STD))
    ref = (0.5 - np.asarray(KUZUSHIJI_MEAN)) / np.asarray(KUZUSHIJI_STD)
    np.testing.assert_allclose(out[0, 0], ref, rtol=1e-5)


def test_letterbox_bilinear_matches_cv2_center(rng):
    """Resize without padding should approximate cv2 bilinear."""
    import cv2

    img = rng.uniform(0, 1, size=(40, 40, 3)).astype(np.float32)
    canvas, gain, _ = letterbox(jnp.asarray(img), 80, 80)
    ref = cv2.resize(img, (80, 80), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(np.asarray(canvas), ref, atol=2e-2)
