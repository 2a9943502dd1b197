"""uint8 image transport: raw-pixel batches == pre-normalized float batches.

Datasets and host-side predictors ship raw uint8 pixels; every model entry
normalizes on-device (``kuzu.ops.images.from_uint8``). This cuts the
host->device transfer 4x — critical through the tunneled TPU, whose client
retains a host copy of every transfer (measured ~1:1 leak; a float32 image
pipeline OOMs a 125 GB host mid-training).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _u8(rng, shape):
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_from_uint8_matches_manual(rng):
    from kuzu.ops.images import from_uint8

    u8 = _u8(rng, (2, 8, 8, 3))
    ref = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    out = np.asarray(from_uint8(jnp.asarray(u8), mean=0.5, std=0.5))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # float input passes through untouched (already normalized)
    f = ref.astype(np.float32)
    np.testing.assert_array_equal(np.asarray(from_uint8(jnp.asarray(f))), f)


def test_yolo_graph_uint8_matches_float(rng):
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.models.yolo.infer import run_graph

    det = YoloDetector("yolov8n", nc=2, dtype=jnp.bfloat16, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    u8 = _u8(rng, (2, 64, 64, 3))
    f32 = u8.astype(np.float32) / 255.0

    ref = det.apply(v, jnp.asarray(f32), train=False)
    out = det.apply(v, jnp.asarray(u8), train=False)
    for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(o, np.float32), atol=1e-3
        )
    # fused executor path too
    ref_g = run_graph(det.spec, v, jnp.asarray(f32))
    out_g = run_graph(det.spec, v, jnp.asarray(u8))
    for r, o in zip(jax.tree.leaves(ref_g), jax.tree.leaves(out_g)):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(o, np.float32), atol=1e-3
        )


def test_trocr_uint8_matches_float(rng):
    from kuzu.models.trocr import TrOCR

    model = TrOCR(
        vocab_size=17, image_size=(64, 32), patch_size=(16, 16),
        enc_dim=32, enc_depth=1, enc_heads=2, dec_dim=32, dec_depth=1,
        dec_heads=2, max_len=8,
    )
    u8 = _u8(rng, (2, 64, 32, 3))
    norm = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    tokens = jnp.zeros((2, 4), jnp.int32)
    v = model.init(jax.random.key(0), jnp.asarray(norm), tokens)
    ref = model.apply(v, jnp.asarray(norm), tokens)
    out = model.apply(v, jnp.asarray(u8), tokens)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_crnn_uint8_matches_float(rng):
    from kuzu.models.crnn import CRNN

    model = CRNN(num_classes=11, dims=(8, 8, 8, 8), lstm_hidden=8)
    u8 = _u8(rng, (2, 64, 16, 3))
    norm = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    v = model.init(jax.random.key(0), jnp.asarray(norm))
    ref, _ = model.apply(v, jnp.asarray(norm))
    out, _ = model.apply(v, jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_datasets_emit_uint8(tmp_path, rng):
    from PIL import Image

    from kuzu.data.ocr_datasets import load_letterboxed

    p = tmp_path / "col.png"
    Image.fromarray(_u8(rng, (100, 20, 3))).save(p)
    out = load_letterboxed(p, 64, 32)
    assert out.dtype == np.uint8 and out.shape == (64, 32, 3)
    # geometric jitter keeps raw pixels
    out_aug = load_letterboxed(p, 64, 32, rng=np.random.default_rng(0))
    assert out_aug.dtype == np.uint8


def test_photometric_aug_bounds(rng):
    from kuzu.ops.images import from_uint8, photometric_aug

    x = from_uint8(jnp.asarray(_u8(rng, (4, 16, 16, 3))))
    y = np.asarray(photometric_aug(x, jax.random.key(0)))
    assert y.shape == x.shape
    assert y.min() >= 0.0 and y.max() <= 1.0
    # different per-sample draws
    assert not np.allclose(y[0], np.asarray(x)[0])
