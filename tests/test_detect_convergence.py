"""Slow opt-in test: detect stack overfits one batch to sub-pixel boxes.

Run with ``pytest --slow``. This is the decisive end-to-end correctness check
for model -> loss -> assigner -> decode -> NMS.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


@pytest.mark.slow
def test_detect_overfits_single_batch():
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.detect_loss import detection_loss
    from kuzu.ops.nms import non_max_suppression
    from kuzu.core.metrics import box_iou_np

    det = YoloDetector("yolov12n", nc=2, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    params, bstats = v["params"], {"batch_stats": v["batch_stats"]}

    img = np.full((2, 64, 64, 3), 0.9, np.float32)
    img[0, 10:40, 8:28] = [0.8, 0.1, 0.1]
    img[1, 20:50, 30:55] = [0.1, 0.1, 0.8]
    imgs = jnp.asarray(img)
    gt_boxes = jnp.asarray([[[8.0, 10, 28, 40]], [[30.0, 20, 55, 50]]])
    gt_labels = jnp.asarray([[0], [1]], jnp.int32)
    mask = jnp.ones((2, 1), bool)

    tx = optax.adamw(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bstats, opt):
        def loss_fn(p):
            feats, mut = det.module.apply(
                {"params": p, **bstats}, imgs, train=True, mutable=["batch_stats"]
            )
            total, m = detection_loss(
                feats, gt_labels, gt_boxes, mask, nc=2, imgsz=64, strides=(8, 16, 32)
            )
            return total, (m, mut)

        (loss, (m, mut)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), mut, opt, loss

    for _ in range(300):
        params, bstats, opt, loss = step(params, bstats, opt)

    feats = det.module.apply({"params": params, **bstats}, imgs, train=False)
    pred = det.decode(feats, imgsz=64)
    out = non_max_suppression(pred, conf_thres=0.25, max_det=10)
    gts = np.asarray(gt_boxes)
    for i in range(2):
        vmask = np.asarray(out["valid"][i])
        boxes = np.asarray(out["boxes"][i])[vmask]
        assert len(boxes) >= 1, f"no confident detection on image {i}"
        iou = box_iou_np(boxes[:1], gts[i])
        assert iou.max() > 0.85, f"img{i}: IoU {iou.max():.3f} too low"
