"""Model-family smoke + behavior tests: UNet-Transformer, CSA-ViT, ViT detector."""

import jax
import jax.numpy as jnp
import numpy as np


def test_unet_transformer_shapes():
    from kuzu.models.unet_transformer import UNetTransformerEncoder

    enc = UNetTransformerEncoder(out_dim=64, base_channels=16, num_downsamples=3, depth=1, num_heads=2)
    imgs = jnp.zeros((2, 64, 32, 3))
    v = enc.init(jax.random.key(0), imgs)
    out, _ = enc.apply(v, imgs, train=True, mutable=["batch_stats"])
    # T = 64*32 / 4^3 / ... each downsample halves both dims: (64/8)*(32/8)=32
    assert out.shape == (2, 32, 64)


def test_csa_vit_ctc_head():
    from kuzu.models.csa_vit import CSAViT

    model = CSAViT(
        vocab_size=20, head="ctc", image_size=(128, 32), patch_size=(16, 16),
        dim=32, depth=2, num_heads=2, structure="cnn",
    )
    imgs = jnp.zeros((2, 128, 32, 3))
    v = model.init(jax.random.key(0), imgs)
    logits = model.apply(v, imgs)
    assert logits.shape == (2, 8, 20)  # gh = 128/16


def test_csa_vit_graph_structure_and_ar_head():
    from kuzu.models.csa_vit import CSAViT

    model = CSAViT(
        vocab_size=20, head="ar", image_size=(64, 32), patch_size=(16, 16),
        dim=32, depth=2, num_heads=2, structure="graph", max_len=8, dec_depth=1,
    )
    imgs = jnp.zeros((2, 64, 32, 3))
    toks = jnp.zeros((2, 8), jnp.int32)
    v = model.init(jax.random.key(0), imgs, toks)
    logits = model.apply(v, imgs, toks)
    assert logits.shape == (2, 8, 20)


def test_csa_vit_grad_checkpoint_equivalent():
    from kuzu.models.csa_vit import CSAViTEncoder

    kw = dict(
        image_size=(64, 32), patch_size=(16, 16), dim=32, depth=2, num_heads=2
    )
    imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 32, 3)), jnp.float32)
    a = CSAViTEncoder(**kw, grad_checkpoint=False)
    b = CSAViTEncoder(**kw, grad_checkpoint=True)
    va = a.init(jax.random.key(0), imgs)
    out_a = a.apply(va, imgs)
    out_b = b.apply(va, imgs)  # same params
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_vit_detector_loss_and_matching():
    from kuzu.models.vit_detector import (
        ViTPatchDetector,
        dynamic_iou_threshold,
        vit_detector_loss,
    )

    model = ViTPatchDetector(
        num_classes=5, image_size=(64, 64), patch_size=(16, 16),
        dim=32, depth=1, num_heads=2,
    )
    imgs = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.key(0), imgs)
    out = model.apply(v, imgs)
    assert out["boxes"].shape == (2, 16, 4)
    assert (np.asarray(out["boxes"][..., 2]) >= np.asarray(out["boxes"][..., 0])).all()

    gt = jnp.asarray([[[0.1, 0.1, 0.4, 0.4]], [[0.5, 0.5, 0.9, 0.9]]])
    labels = jnp.asarray([[1], [2]], jnp.int32)
    mask = jnp.ones((2, 1), bool)
    thr = dynamic_iou_threshold(jnp.asarray(0))
    loss, metrics = vit_detector_loss(out, gt, labels, mask, thr, num_classes=5)
    assert np.isfinite(float(loss))
    # threshold schedule ramps
    np.testing.assert_allclose(float(dynamic_iou_threshold(jnp.asarray(0))), 0.3, rtol=1e-5)
    np.testing.assert_allclose(float(dynamic_iou_threshold(jnp.asarray(100))), 0.5, rtol=1e-5)


def test_vit_detector_freeze_mask():
    import jax

    from kuzu.models.vit_detector import ViTPatchDetector, freeze_mask

    model = ViTPatchDetector(
        num_classes=3, image_size=(32, 32), patch_size=(16, 16),
        dim=32, depth=3, num_heads=2,
    )
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    mask = freeze_mask(v["params"], frozen_blocks=2)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen = [p for p, m in flat if not m]
    trainable = [p for p, m in flat if m]
    assert any("block0" in str(p) for p in frozen)
    assert any("block2" in str(p) for p in trainable)
    assert not any("block2" in str(p) for p in frozen)
