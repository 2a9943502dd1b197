"""Detection end-to-end: synthetic YOLO-format dataset -> train -> val -> predict.

Mirrors the reference engine's toy-dataset tests
(``yolov12/tests/test_python.py:205`` train-scratch on bundled coco8).
"""

import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw

COLORS = [(220, 40, 40), (40, 40, 220)]


def _draw_scene(rng, size=96, n_obj=3):
    img = Image.new("RGB", (size, size), (240, 240, 235))
    d = ImageDraw.Draw(img)
    rows = []
    for _ in range(n_obj):
        cls = int(rng.integers(0, 2))
        w, h = int(rng.integers(16, 32)), int(rng.integers(16, 32))
        x = int(rng.integers(0, size - w))
        y = int(rng.integers(0, size - h))
        if cls == 0:
            d.rectangle([x, y, x + w, y + h], fill=COLORS[0])
        else:
            d.ellipse([x, y, x + w, y + h], fill=COLORS[1])
        cx, cy = (x + w / 2) / size, (y + h / 2) / size
        rows.append(f"{cls} {cx:.6f} {cy:.6f} {w / size:.6f} {h / size:.6f}")
    return img, rows


@pytest.fixture(scope="module")
def yolo_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("yolods")
    rng = np.random.default_rng(0)
    for split, n in (("train", 16), ("val", 8)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img, rows = _draw_scene(rng)
            img.save(root / "images" / split / f"{i}.jpg")
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(rows))
    spec = {
        "path": ".",
        "train": "images/train",
        "val": "images/val",
        "names": {0: "box", 1: "ball"},
        "nc": 2,
    }
    yml = root / "dataset.yaml"
    yml.write_text(yaml.safe_dump(spec))
    return yml


def test_yolo_dataset_shapes(yolo_dataset):
    from kuzu.data.yolo_dataset import YoloDetectionDataset

    ds = YoloDetectionDataset(yolo_dataset, split="train", imgsz=64, max_boxes=20)
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["gt_boxes"].shape == (20, 4)
    assert s["mask_gt"].sum() >= 1
    # boxes are inside the canvas
    b = s["gt_boxes"][s["mask_gt"]]
    assert (b >= 0).all() and (b <= 64).all()
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_yolo_dataset_no_augment_deterministic(yolo_dataset):
    from kuzu.data.yolo_dataset import YoloDetectionDataset

    ds = YoloDetectionDataset(yolo_dataset, split="val", imgsz=64, augment=False)
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])


def test_mosaic_produces_valid_boxes(yolo_dataset):
    from kuzu.data.yolo_dataset import YoloDetectionDataset

    ds = YoloDetectionDataset(
        yolo_dataset, split="train", imgsz=64,
        hyp={"mosaic": 1.0, "scale": 0.4},
    )
    for i in range(4):
        s = ds[i]
        b = s["gt_boxes"][s["mask_gt"]]
        if len(b):
            assert (b[:, 2:] - b[:, :2] > 0).all()
            assert (b >= 0).all() and (b <= 64).all()


def test_image_cache_identical_samples(yolo_dataset):
    """cache_images=ram/disk must not change a single pixel or box: the
    cache stores the decoded RGB array, every augmentation draws from the
    same seeded rng. Also guards against in-place mutation of cached
    arrays by the augmentation pipeline (two epochs compared)."""
    from kuzu.data.yolo_dataset import YoloDetectionDataset

    def build(cache_images):
        return YoloDetectionDataset(
            yolo_dataset, split="train", imgsz=64, max_boxes=20,
            hyp={"mosaic": 1.0, "scale": 0.4}, cache_images=cache_images,
        )

    ref, ram = build(None), build("ram")
    for epoch in (0, 1):  # epoch 1 re-reads the now-populated cache
        ref.set_epoch(epoch)
        ram.set_epoch(epoch)
        for i in range(4):
            a, b = ref[i], ram[i]
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])

    disk = build("disk")
    try:
        s = disk[0]
        np.testing.assert_array_equal(ref.set_epoch(1) or ref[0]["image"],
                                      disk.set_epoch(1) or disk[0]["image"])
        assert list(yolo_dataset.parent.rglob("*.cache.npy")), "no disk cache"
    finally:
        for p in yolo_dataset.parent.rglob("*.cache.npy"):
            p.unlink()


def _detect_cfg(yolo_dataset, tmp_path, **kw):
    from kuzu.core.config import load_config

    base = dict(
        task="detect",
        model="yolov12n",
        data=str(yolo_dataset),
        epochs=1,
        batch=4,
        imgsz=64,
        max_boxes=20,
        lr0=0.002,
        optimizer="adamw",
        warmup_epochs=0.0,
        close_mosaic=0,
        project=str(tmp_path / "runs"),
        name="d",
        exist_ok=True,
        workers=0,
        dtype="float32",
        val_batches=2,
    )
    base.update(kw)
    return load_config(overrides=base)


def test_detect_trainer_end_to_end(yolo_dataset, tmp_path):
    from kuzu.tasks.detect import DetectTrainer

    cfg = _detect_cfg(yolo_dataset, tmp_path)
    trainer = DetectTrainer(cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"])
    assert result["num_fg"] > 0, "assigner produced no foreground anchors"
    assert result["box_loss"] > 0
    assert "map50" in result
    assert (trainer.save_dir / "weights" / "last").exists()
    # batch_stats were updated (not all zeros/ones)
    bs = trainer.state.model_state["batch_stats"]
    import jax

    leaves = jax.tree.leaves(bs)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_detect_predict_roundtrip(yolo_dataset, tmp_path):
    from kuzu.tasks.detect import DetectPredictor, DetectTrainer

    cfg = _detect_cfg(yolo_dataset, tmp_path, name="p")
    trainer = DetectTrainer(cfg)
    trainer.train()
    pred_cfg = _detect_cfg(
        yolo_dataset, tmp_path,
        model=str(trainer.save_dir), conf=0.0001, name="pp",
    )
    predictor = DetectPredictor(pred_cfg)
    img = yolo_dataset.parent / "images" / "val" / "0.jpg"
    results = predictor([img])
    assert len(results) == 1
    r = results[0]
    assert r["boxes"].shape[1] == 4
    # rescaled boxes are within the original 96x96 frame
    if len(r["boxes"]):
        assert (r["boxes"] >= 0).all() and (r["boxes"] <= 96).all()

    # static batch bucketing (round-2 VERDICT item 6): 3 and 4 pages pad to
    # the same power-of-two bucket, so the second call must hit the jit
    # cache instead of compiling a fresh XLA program per page count
    assert len(predictor([img] * 3)) == 3
    n3 = predictor._fwd_jit._cache_size()
    assert len(predictor([img] * 4)) == 4
    assert predictor._fwd_jit._cache_size() == n3

    # video source (reference data/loaders.py video branch): synthesize a
    # clip whose object moves a few px per frame, predict it, and track it
    # with persistent IDs across frames
    import cv2

    from PIL import Image, ImageDraw

    vid = tmp_path / "clip.avi"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 96))
    for t in range(6):
        fr = Image.new("RGB", (96, 96), (240, 240, 235))
        ImageDraw.Draw(fr).rectangle(
            [20 + 3 * t, 30, 50 + 3 * t, 60], fill=(220, 40, 40)
        )
        vw.write(np.asarray(fr)[..., ::-1])
    vw.release()

    vres = predictor(str(vid))
    assert len(vres) == 6
    assert all("#frame=" in r.path for r in vres)
    assert vres[0].orig_img is not None  # frames carry pixels for trackers

    from kuzu.api.model import Model

    m = Model(str(trainer.save_dir), task="detect")
    # a 1-epoch model emits low scores: drop the tracker thresholds so the
    # association logic (not detector quality) is what's under test
    tracked = m.track(
        str(vid), conf=0.0001, persist=False,
        track_high_thresh=1e-4, track_low_thresh=1e-5,
        new_track_thresh=1e-4,
    )
    ids = [
        set(np.asarray(r.boxes.id).tolist())
        for r in tracked
        if r.boxes.id is not None and len(r.boxes.id)
    ]
    assert len(ids) >= 4, "tracker lost the moving object"
    # one identity persists across (almost) every frame
    common = set.intersection(*ids)
    assert len(common) >= 1


def test_mixup_shear_perspective_produce_valid_boxes(yolo_dataset):
    """Every formerly-silent aug flag now transforms (reference
    data/augment.py:867 MixUp, :952 shear/perspective)."""
    from kuzu.data.yolo_dataset import YoloDetectionDataset

    ds = YoloDetectionDataset(
        yolo_dataset, split="train", imgsz=64,
        hyp={"mosaic": 1.0, "mixup": 1.0, "shear": 10.0,
             "perspective": 0.0005, "scale": 0.4},
    )
    for i in range(4):
        s = ds[i]
        b = s["gt_boxes"][s["mask_gt"]]
        if len(b):
            assert (b[:, 2:] - b[:, :2] > 0).all()
            assert (b >= 0).all() and (b <= 64).all()


def test_copy_paste_adds_instances(yolo_dataset):
    from kuzu.data.yolo_dataset import copy_paste
    import numpy as np

    rng = np.random.default_rng(0)
    img = np.full((64, 64, 3), 114, np.uint8)
    img[10:20, 5:15] = 255
    boxes = np.array([[5.0, 10, 15, 20]], np.float32)
    labels = np.array([1], np.int32)
    out_img, out_boxes, out_labels = copy_paste(img, boxes, labels, rng, p=1.0)
    assert len(out_boxes) == 2  # mirrored instance added
    assert out_labels.tolist() == [1, 1]
    m = out_boxes[1]
    assert (m >= 0).all() and (m <= 64).all()
    # mirrored patch actually pasted
    assert out_img[10:20, 49:59].max() == 255


def test_affine_respects_aspect_filter(yolo_dataset):
    from kuzu.data.yolo_dataset import random_affine
    import numpy as np

    rng = np.random.default_rng(0)
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[10.0, 10, 40, 40]], np.float32)
    labels = np.array([0], np.int32)
    out, nb, nl = random_affine(
        img, boxes, labels, rng, 64, degrees=5, translate=0.05, scale=0.1,
        shear=5.0, perspective=0.0005,
    )
    assert out.shape == (64, 64, 3)
    if len(nb):
        assert (nb[:, 2:] - nb[:, :2] > 0).all()
