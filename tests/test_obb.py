"""OBB task end-to-end (reference OBBModel + v8OBBLoss +
RotatedTaskAlignedAssigner + nms_rotated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw


def _rot_rect(cx, cy, w, h, r):
    c, s = np.cos(r), np.sin(r)
    pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
    return pts @ np.array([[c, s], [-s, c]]).T * [1, 1] @ np.eye(2) + [cx, cy]


def _scene(rng, size=96):
    img = Image.new("RGB", (size, size), (240, 240, 235))
    d = ImageDraw.Draw(img)
    cx, cy = rng.uniform(28, size - 28, 2)
    w, h = rng.uniform(26, 40), rng.uniform(14, 22)
    r = rng.uniform(-np.pi / 4, np.pi / 4)
    pts = _rot_rect(cx, cy, w, h, r)
    d.polygon([tuple(p) for p in pts], fill=(200, 40, 40))
    row = "0 " + " ".join(f"{x / size:.4f} {y / size:.4f}" for x, y in pts)
    return img, row, (cx, cy, w, h, r)


@pytest.fixture(scope="module")
def obb_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("obbds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 12), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img, row, _ = _scene(rng)
            img.save(root / "images" / split / f"{i}.jpg")
            (root / "labels" / split / f"{i}.txt").write_text(row)
    yml = root / "dataset.yaml"
    yml.write_text(
        yaml.safe_dump({"path": ".", "train": "images/train",
                        "val": "images/val", "names": {0: "slab"}, "nc": 1})
    )
    return yml


def test_probiou_identity_and_disjoint():
    from kuzu.ops.obb import probiou

    a = jnp.asarray([[10.0, 10, 8, 4, 0.3]])
    b = jnp.asarray([[40.0, 40, 8, 4, 0.3]])
    assert float(probiou(a, a)[0]) > 0.99
    assert float(probiou(a, b)[0]) < 0.05
    # rotation sensitivity: same center/size, perpendicular angle
    c = jnp.asarray([[10.0, 10, 8, 4, 0.3 + np.pi / 2]])
    assert float(probiou(a, c)[0]) < float(probiou(a, a)[0])


def test_obb_dataset_angles(obb_dataset):
    from kuzu.data.yolo_dataset import YoloOBBDataset

    ds = YoloOBBDataset(obb_dataset, split="train", imgsz=64, max_boxes=4)
    s = ds[0]
    assert s["gt_rboxes"].shape == (4, 5)
    n = int(s["mask_gt"].sum())
    assert n == 1
    r = s["gt_rboxes"][0]
    assert 2 < r[2] < 64 and 2 < r[3] < 64
    assert -np.pi / 4 - 1e-3 <= r[4] < 3 * np.pi / 4 + 1e-3


def test_rotated_nms_suppresses_overlaps():
    from kuzu.ops.obb import nms_rotated_padded

    boxes = jnp.asarray(
        [[[20.0, 20, 16, 8, 0.2], [21, 20, 16, 8, 0.22], [60, 60, 10, 10, 0.0]]]
    )
    scores = jnp.asarray([[0.9, 0.8, 0.7]])
    classes = jnp.zeros((1, 3), jnp.int32)
    out = nms_rotated_padded(
        boxes, scores, classes, jnp.ones((1, 3), bool),
        iou_threshold=0.4, score_threshold=0.01, max_det=8,
    )
    assert int(out["valid"].sum()) == 2  # near-duplicate suppressed


def test_obb_loss_finite_and_assigns(obb_dataset):
    from kuzu.data.yolo_dataset import YoloOBBDataset
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.obb import obb_loss

    ds = YoloOBBDataset(obb_dataset, split="train", imgsz=64, max_boxes=4)
    batch = {
        k: jnp.asarray(np.stack([ds[i][k] for i in range(4)]))
        for k in ("image", "gt_rboxes", "gt_labels", "mask_gt")
    }
    det = YoloDetector("yolov8n-obb", nc=1, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    out = det.apply(v, batch["image"])
    total, metrics = obb_loss(
        out, batch["gt_labels"], batch["gt_rboxes"], batch["mask_gt"],
        nc=1, imgsz=64, strides=tuple(det.strides),
    )
    assert np.isfinite(float(total))
    assert float(metrics["num_fg"]) > 0


def test_obb_trainer_end_to_end(obb_dataset, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.obb import OBBPredictor, OBBTrainer

    cfg = load_config(
        overrides=dict(
            task="obb", model="yolov8n-obb", data=str(obb_dataset),
            epochs=1, batch=4, imgsz=64, max_boxes=4, workers=0,
            dtype="float32", project=str(tmp_path / "runs"), name="o",
            exist_ok=True, val_batches=1, optimizer="adamw",
            warmup_epochs=0.0, lr0=0.002,
        )
    )
    trainer = OBBTrainer(cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"])
    assert "f1" in result
    assert "map50" in result and "map" in result  # probIoU-matched mAP

    pred_cfg = load_config(
        overrides=dict(task="obb", model=str(trainer.save_dir), conf=0.0001)
    )
    predictor = OBBPredictor(pred_cfg)
    img = obb_dataset.parent / "images" / "val" / "0.jpg"
    r = predictor([img])[0]
    assert hasattr(r, "obb") and len(r.obb) == len(r.boxes)
    if len(r.obb):
        assert r.obb.xywhr.shape[1] == 5
        assert r.obb.xyxyxyxy.shape[1:] == (4, 2)
