"""Instance-segmentation task end-to-end (reference SegmentationModel +
v8SegmentationLoss + segment predict, ``nn/tasks.py:391`` /
``utils/loss.py:263`` / ``models/yolo/segment/*``)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw


def _scene(rng, size=96):
    """Filled shapes with exact polygon annotations."""
    img = Image.new("RGB", (size, size), (240, 240, 235))
    d = ImageDraw.Draw(img)
    rows = []
    for _ in range(2):
        cls = int(rng.integers(0, 2))
        w, h = int(rng.integers(24, 40)), int(rng.integers(24, 40))
        x, y = int(rng.integers(0, size - w)), int(rng.integers(0, size - h))
        if cls == 0:
            d.rectangle([x, y, x + w, y + h], fill=(220, 40, 40))
            poly = [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]
        else:
            d.polygon(
                [(x + w // 2, y), (x + w, y + h), (x, y + h)], fill=(40, 40, 220)
            )
            poly = [(x + w // 2, y), (x + w, y + h), (x, y + h)]
        pts = " ".join(f"{px / size:.4f} {py / size:.4f}" for px, py in poly)
        rows.append(f"{cls} {pts}")
    return img, rows


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("segds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 12), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img, rows = _scene(rng)
            img.save(root / "images" / split / f"{i}.jpg")
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(rows))
    yml = root / "dataset.yaml"
    yml.write_text(
        yaml.safe_dump(
            {"path": ".", "train": "images/train", "val": "images/val",
             "names": {0: "boxy", 1: "tri"}, "nc": 2}
        )
    )
    return yml


def test_segment_dataset_masks(seg_dataset):
    from kuzu.data.yolo_dataset import YoloSegmentDataset

    ds = YoloSegmentDataset(seg_dataset, split="train", imgsz=64, max_boxes=8)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["masks"].shape == (16, 16) and s["masks"].dtype == np.int32
    n = int(s["mask_gt"].sum())
    assert n == 2
    # every instance has pixels, indexed 1..n, inside its (downscaled) box
    for i in range(n):
        ys, xs = np.nonzero(s["masks"] == i + 1)
        assert len(xs) > 0
        x1, y1, x2, y2 = s["gt_boxes"][i] / 4.0
        assert xs.min() >= x1 - 1.5 and xs.max() <= x2 + 1.5
        assert ys.min() >= y1 - 1.5 and ys.max() <= y2 + 1.5


def test_segment_graph_and_loss(seg_dataset):
    from kuzu.data.yolo_dataset import YoloSegmentDataset
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.seg_loss import segmentation_loss

    ds = YoloSegmentDataset(seg_dataset, split="train", imgsz=64, max_boxes=8)
    batch = {
        k: jnp.asarray(np.stack([ds[i][k] for i in range(4)]))
        for k in ("image", "gt_boxes", "gt_labels", "mask_gt", "masks")
    }
    det = YoloDetector("yolov8n-seg", nc=2, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    out = det.apply(v, batch["image"])
    total, metrics = segmentation_loss(
        out, batch["gt_labels"], batch["gt_boxes"], batch["masks"],
        batch["mask_gt"], nc=2, imgsz=64, strides=tuple(det.strides),
    )
    assert np.isfinite(float(total))
    assert float(metrics["seg_loss"]) > 0
    assert float(metrics["seg_fg_dropped"]) == 0.0
    # gradients flow into the proto + coeff branches
    def loss_of(params):
        o = det.apply({"params": params, **{k: x for k, x in v.items() if k != "params"}}, batch["image"])
        t, _ = segmentation_loss(
            o, batch["gt_labels"], batch["gt_boxes"], batch["masks"],
            batch["mask_gt"], nc=2, imgsz=64, strides=tuple(det.strides),
        )
        return t

    g = jax.grad(loss_of)(v["params"])
    seg_head = [k for k in g if "Segment" in k]
    assert seg_head, list(g)[:5]
    leaves = jax.tree.leaves({k: g[k] for k in seg_head})
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)


def test_crop_loss_to_box():
    from kuzu.ops.seg_loss import crop_loss_to_box

    loss = jnp.ones((1, 8, 8))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0]])
    out = np.asarray(crop_loss_to_box(loss, boxes))
    assert out.sum() == 16  # 4x4 box
    assert out[0, 0, 0] == 0 and out[0, 3, 3] == 1


def test_segment_trainer_end_to_end(seg_dataset, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.segment import SegmentPredictor, SegmentTrainer

    cfg = load_config(
        overrides=dict(
            task="segment", model="yolov8n-seg", data=str(seg_dataset),
            epochs=1, batch=4, imgsz=64, max_boxes=8, workers=0,
            dtype="float32", project=str(tmp_path / "runs"), name="s",
            exist_ok=True, val_batches=1, optimizer="adamw",
            warmup_epochs=0.0, lr0=0.002,
        )
    )
    trainer = SegmentTrainer(cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"]) and result["seg_loss"] > 0
    assert "map50" in result  # box mAP over the same validator

    pred_cfg = load_config(
        overrides=dict(
            task="segment", model=str(trainer.save_dir), conf=0.0001,
        )
    )
    predictor = SegmentPredictor(pred_cfg)
    img = seg_dataset.parent / "images" / "val" / "0.jpg"
    r = predictor([img])[0]
    assert r.masks is not None
    assert len(r.masks) == len(r.boxes)
    if len(r.masks):
        full = r.masks.full()
        assert full.shape[1:] == (96, 96)
