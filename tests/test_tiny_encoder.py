"""MobileSAM TinyViT-lite encoder (reference
``yolov12/ultralytics/models/sam/modules/tiny_encoder.py`` ``TinyViT``,
``sam/build.py:56`` ``build_mobile_sam``)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_window_roundtrip():
    from kuzu.models.tiny_encoder import window_merge, window_partition

    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 8))
    w = window_partition(x, 4)
    assert w.shape == (2 * 16, 16, 8)
    np.testing.assert_array_equal(
        np.asarray(window_merge(w, 4, (16, 16))), np.asarray(x)
    )


def test_encoder_contract_and_size():
    """Same contract as SAMImageEncoder at a fraction of the params."""
    from kuzu.models.sam import SAMImageEncoder
    from kuzu.models.tiny_encoder import TinyViTEncoder

    img = jnp.zeros((2, 128, 128, 3))
    tiny = TinyViTEncoder(img_size=128, dim=256)
    tv = jax.jit(lambda: tiny.init(jax.random.key(0), img))()
    out = tiny.apply(tv, img)
    assert out.shape == (2, 64, 256)  # (S/16)^2 tokens, decoder dim
    assert np.all(np.isfinite(np.asarray(out)))

    vit = SAMImageEncoder(img_size=128, dim=256, depth=6, num_heads=8)
    vv = jax.jit(lambda: vit.init(jax.random.key(0), img))()
    n_tiny = sum(x.size for x in jax.tree.leaves(tv))
    n_vit = sum(x.size for x in jax.tree.leaves(vv))
    assert n_tiny < 0.6 * n_vit, (n_tiny, n_vit)


def test_sam_with_tiny_encoder():
    from kuzu.models.sam import PAD, SAM

    m = SAM(
        img_size=64, dim=64, dec_heads=4, encoder_kind="tiny", num_masks=3
    )
    pts = jnp.array([[[0.5, 0.5]]])
    lbl = jnp.full((1, 1), PAD, jnp.int32)
    img = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda: m.init(jax.random.key(0), img, pts, lbl))()
    masks, iou = m.apply(v, img, pts, lbl)
    assert masks.shape == (1, 3, 16, 16)
    assert iou.shape == (1, 3)


def test_sam2_with_tiny_encoder():
    from kuzu.models.sam2 import SAM2, SAM2VideoPredictor

    m = SAM2(
        img_size=64, dim=64, mem_dim=32, dec_heads=4, mem_depth=1,
        encoder_kind="tiny",
    )
    pred = SAM2VideoPredictor.create(m, jax.random.key(0), clip_shape=(1, 2))
    masks, iou = pred.predict(
        jnp.zeros((1, 3, 64, 64, 3)),
        jnp.array([[[0.5, 0.5]]]),
        jnp.ones((1, 1), jnp.int32),
    )
    assert masks.shape == (1, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(masks)))
