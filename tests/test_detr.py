"""DETR family: shapes, Hungarian matching, single-batch convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_detr_forward_shapes():
    from kuzu.models.detr import DETR, SIZE_REGISTRY

    cfg = SIZE_REGISTRY["nano"]
    model = DETR(num_classes=3, **cfg)
    imgs = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.key(0), imgs)
    out = model.apply(v, imgs)
    assert out["logits"].shape == (2, cfg["queries"], 4)
    assert out["boxes"].shape == (2, cfg["queries"], 4)
    assert (np.asarray(out["boxes"]) >= 0).all()


def test_detr_loss_and_matching():
    from kuzu.models.detr import DETR, detr_loss

    model = DETR(num_classes=2, dim=64, enc_depth=1, dec_depth=1, heads=2, queries=8)
    imgs = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.key(0), imgs)
    out = model.apply(v, imgs)
    gt = jnp.asarray([[[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]]])
    labels = jnp.asarray([[0, 1]], jnp.int32)
    mask = jnp.ones((1, 2), bool)
    loss, m = detr_loss(out, gt, labels, mask, num_classes=2)
    assert np.isfinite(float(loss))
    for k in ("cls_loss", "l1_loss", "giou_loss"):
        assert np.isfinite(float(m[k]))


@pytest.mark.slow
def test_detr_overfits_single_batch():
    import optax

    from kuzu.models.detr import DETR, detr_loss, detr_postprocess
    from kuzu.core.metrics import box_iou_np

    model = DETR(num_classes=2, dim=64, enc_depth=1, dec_depth=2, heads=4, queries=8)
    img = np.full((1, 64, 64, 3), 0.9, np.float32)
    img[0, 6:26, 6:26] = [0.8, 0.1, 0.1]
    img[0, 38:58, 32:60] = [0.1, 0.1, 0.8]
    imgs = jnp.asarray(img)
    gt = jnp.asarray([[[6 / 64, 6 / 64, 26 / 64, 26 / 64],
                       [32 / 64, 38 / 64, 60 / 64, 58 / 64]]])
    labels = jnp.asarray([[0, 1]], jnp.int32)
    mask = jnp.ones((1, 2), bool)
    v = model.init(jax.random.key(0), imgs)
    params = v["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, imgs, train=True)
            loss, _ = detr_loss(out, gt, labels, mask, num_classes=2)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(300):
        params, opt, loss = step(params, opt)
    out = model.apply({"params": params}, imgs)
    post = detr_postprocess(out, conf=0.5, image_size=64)
    valid = np.asarray(post["valid"][0])
    boxes = np.asarray(post["boxes"][0])[valid]
    assert len(boxes) >= 2
    gts = np.asarray(gt[0]) * 64
    iou = box_iou_np(boxes, gts)
    assert iou.max(axis=0).min() > 0.6, f"poor localization: {iou}"
