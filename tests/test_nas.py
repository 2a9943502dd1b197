"""YOLO-NAS family: QARepVGG re-parameterization, decoded-output contract,
and detect-task reuse (reference ``ultralytics/models/nas/*`` — there a
pretrained-only wrapper; here a buildable/trainable architecture, see
kuzu/models/nas.py docstring)."""

import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw


@pytest.fixture(scope="module")
def yolo_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("nasds")
    rng = np.random.default_rng(7)
    for split, n in (("train", 16), ("val", 8)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            size = 96
            img = Image.new("RGB", (size, size), (240, 240, 235))
            d = ImageDraw.Draw(img)
            rows = []
            for _ in range(3):
                w, h = int(rng.integers(16, 32)), int(rng.integers(16, 32))
                x = int(rng.integers(0, size - w))
                y = int(rng.integers(0, size - h))
                d.rectangle([x, y, x + w, y + h], fill=(220, 40, 40))
                rows.append(
                    f"0 {(x + w / 2) / size:.6f} {(y + h / 2) / size:.6f} "
                    f"{w / size:.6f} {h / size:.6f}"
                )
            img.save(root / "images" / split / f"{i}.jpg")
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(rows))
    yml = root / "dataset.yaml"
    yml.write_text(
        yaml.safe_dump(
            {"path": ".", "train": "images/train", "val": "images/val",
             "names": {0: "box"}, "nc": 1}
        )
    )
    return yml


@pytest.mark.parametrize("ci,co,stride", [(32, 32, 1), (32, 48, 1), (32, 48, 2)])
def test_qarepvgg_fuse_equivalence(ci, co, stride):
    """The 3-branch train structure and the single fused 3x3 conv are the
    same function in eval mode — including after running stats move."""
    import jax
    import jax.numpy as jnp

    from kuzu.models.nas import QARepVGG

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, ci)),
                    jnp.float32)
    block = QARepVGG(co, stride=stride)
    variables = block.init(jax.random.key(0), x, train=False)
    # move the running stats off their init values
    _, mut = block.apply(variables, x, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], **mut}

    ref = block.apply(variables, x, train=False)
    fused = QARepVGG(co, stride=stride, fuse=True).apply(
        variables, x, train=False
    )
    assert ref.shape == fused.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused),
                               rtol=1e-4, atol=1e-4)


def test_yolo_nas_shapes_decode_and_fused_infer():
    import jax
    import jax.numpy as jnp

    from kuzu.models.nas import NASDetector
    from kuzu.ops.nms import non_max_suppression

    det = NASDetector("yolo_nas_s", nc=3, imgsz=64)
    variables = det.init(jax.random.key(0), imgsz=64)
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(0, 255, (2, 64, 64, 3)), jnp.float32
    ) / 255.0
    feats = det.apply(variables, imgs, train=False)
    assert [f.shape[1:3] for f in feats] == [(8, 8), (4, 4), (2, 2)]
    assert all(f.shape[-1] == 4 * 16 + 3 for f in feats)

    pred = det.decode(feats)
    a = 8 * 8 + 4 * 4 + 2 * 2
    assert pred.shape == (2, 4 + 3, a)

    # fused inference path equals the unfused eval forward
    fused_feats = det.infer(variables, imgs)
    for f, g in zip(feats, fused_feats):
        np.testing.assert_allclose(np.asarray(f), np.asarray(g),
                                   rtol=2e-4, atol=2e-4)

    # decoded-output contract the reference wraps (super_gradients eval
    # forward: xyxy boxes + scores; nas/predict.py:38-47 then NMS)
    boxes, scores = det.decoded(variables, imgs)
    assert boxes.shape == (2, a, 4) and scores.shape == (2, a, 3)
    assert (np.asarray(scores) >= 0).all() and (np.asarray(scores) <= 1).all()
    out = non_max_suppression(pred, conf_thres=0.25, max_det=16)
    assert out["boxes"].shape == (2, 16, 4)


def test_nas_sizes_scale():
    """s/m/l widths+depths actually scale the parameter count."""
    import jax

    from kuzu.models.nas import NASDetector

    counts = {}
    for size in ("s", "m", "l"):
        det = NASDetector(f"yolo_nas_{size}", nc=80, imgsz=32)
        variables = det.init(jax.random.key(0), imgsz=32)
        counts[size] = det.param_count(variables)
    assert counts["s"] < counts["m"] < counts["l"]
    assert counts["s"] > 1e6


def test_nas_trains_with_detection_loss():
    import jax
    import jax.numpy as jnp

    from kuzu.models.nas import NASDetector
    from kuzu.ops.detect_loss import detection_loss

    det = NASDetector("yolo_nas_s", nc=2, imgsz=64)
    variables = det.init(jax.random.key(0), imgsz=64)
    imgs = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    gt_boxes = jnp.asarray([[[8, 8, 32, 32], [40, 40, 60, 60]]] * 2,
                           jnp.float32)
    gt_labels = jnp.zeros((2, 2), jnp.int32)
    mask_gt = jnp.ones((2, 2), bool)

    def loss_fn(params):
        feats, _ = det.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}},
            imgs, train=True, mutable=["batch_stats"],
        )
        total, metrics = detection_loss(
            feats, gt_labels, gt_boxes, mask_gt, nc=2, imgsz=64,
            strides=tuple(det.strides),
        )
        return total, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    gnorm = sum(float((g ** 2).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_nas_task_end_to_end(yolo_dataset, tmp_path):
    """Train -> val -> predict through the registered 'nas' task (the
    reference's task_map routes NAS to detect predictor/validator,
    nas/model.py:92-94; kuzu adds the trainer)."""
    from kuzu.api.model import task_map
    from kuzu.core.config import load_config

    tm = task_map()
    assert "nas" in tm and {"trainer", "validator", "predictor"} <= set(tm["nas"])

    cfg = load_config(overrides=dict(
        task="nas", model="yolo_nas_s", data=str(yolo_dataset),
        epochs=1, batch=4, imgsz=64, max_boxes=20, lr0=0.002,
        optimizer="adamw", warmup_epochs=0.0, close_mosaic=0,
        project=str(tmp_path / "runs"), name="nas", exist_ok=True,
        workers=0, dtype="float32", val_batches=2,
    ))
    trainer = tm["nas"]["trainer"](cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"])
    assert "map50" in result
    assert (trainer.save_dir / "weights" / "last").exists()

    pred_cfg = load_config(overrides=dict(
        task="nas", model=str(trainer.save_dir), conf=0.0001, batch=4,
        workers=0,
    ))
    predictor = tm["nas"]["predictor"](pred_cfg)
    img = yolo_dataset.parent / "images" / "val" / "0.jpg"
    results = predictor([img])
    assert len(results) == 1
    r = results[0]
    assert r.boxes.xyxy.shape[1] == 4
    if len(r.boxes):
        assert (r.boxes.xyxy >= 0).all() and (r.boxes.xyxy <= 96).all()
