"""SAM family: SAM-lite promptable segmentation (train -> prompt ->
everything) and the FastSAM prompt-selection wrapper (reference
``ultralytics/models/sam`` + ``models/fastsam``)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    """Filled shapes on plain paper — one obvious instance per prompt."""
    root = tmp_path_factory.mktemp("samds")
    rng = np.random.default_rng(3)
    for split, n in (("train", 16), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            size = 96
            img = Image.new("RGB", (size, size), (240, 240, 235))
            d = ImageDraw.Draw(img)
            rows = []
            for _ in range(2):
                w, h = int(rng.integers(28, 44)), int(rng.integers(28, 44))
                x, y = (
                    int(rng.integers(0, size - w)),
                    int(rng.integers(0, size - h)),
                )
                d.rectangle([x, y, x + w, y + h], fill=(200, 30, 30))
                poly = [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]
                pts = " ".join(
                    f"{px / size:.4f} {py / size:.4f}" for px, py in poly
                )
                rows.append(f"0 {pts}")
            img.save(root / "images" / split / f"{i}.jpg")
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(rows))
    yml = root / "dataset.yaml"
    yml.write_text(
        yaml.safe_dump(
            {"path": ".", "train": "images/train", "val": "images/val",
             "names": {0: "thing"}, "nc": 1}
        )
    )
    return yml


def test_sam_forward_shapes():
    from kuzu.models.sam import PAD, SAM

    m = SAM(img_size=64, dim=32, enc_depth=1, enc_heads=2, dec_heads=2)
    pts = jnp.zeros((2, 4, 2), jnp.float32)
    lbl = jnp.full((2, 4), PAD, jnp.int32)
    v = m.init(jax.random.key(0), jnp.zeros((2, 64, 64, 3)), pts, lbl)
    masks, iou = m.apply(v, jnp.zeros((2, 64, 64, 3)), pts, lbl)
    assert masks.shape == (2, 3, 16, 16)
    assert iou.shape == (2, 3)
    assert np.isfinite(np.asarray(masks)).all()


@pytest.fixture(scope="module")
def sam_run(seg_dataset, tmp_path_factory):
    from kuzu.core.config import load_config
    from kuzu.tasks.sam import SAMTrainer

    tmp = tmp_path_factory.mktemp("samrun")
    cfg = load_config(
        overrides=dict(
            # 16 imgs / batch 8 = 2 steps/epoch: the budget is ~160 steps
            # (an 80-step single-batch probe reaches IoU 0.84; cosine decay
            # over too few epochs starved the first attempt)
            task="sam", data=str(seg_dataset), epochs=80, batch=8,
            imgsz=64, dim=64, enc_depth=2, enc_heads=2, workers=0,
            dtype="float32", project=str(tmp / "runs"), name="sam",
            exist_ok=True, optimizer="adamw", lr0=0.005,
            warmup_epochs=0.0, patience=200,
        )
    )
    trainer = SAMTrainer(cfg)
    result = trainer.train()
    return trainer, result


def test_sam_trains_and_grounds_prompts(sam_run):
    trainer, result = sam_run
    assert np.isfinite(result["loss"])
    # prompted mask quality must be far above chance on the toy shapes
    assert result["miou"] > 0.3, result


def test_sam_predictor_prompts_and_everything(sam_run, seg_dataset):
    from kuzu.core.config import load_config
    from kuzu.tasks.sam import SAMPredictor

    trainer, _ = sam_run
    pred = SAMPredictor(load_config(overrides=dict(model=str(trainer.save_dir))))
    img_path = seg_dataset.parent / "images" / "val" / "0.jpg"
    # GT: first labeled instance's polygon -> its box and center
    row = (
        (seg_dataset.parent / "labels" / "val" / "0.txt")
        .read_text()
        .splitlines()[0]
        .split()
    )
    pts = np.array(row[1:], np.float32).reshape(-1, 2) * 96
    box = np.array(
        [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
    )
    center = [(box[0] + box[2]) / 2, (box[1] + box[3]) / 2]
    masks, iou = pred(img_path, points=[center])
    assert masks.shape[0] == 1 and masks.dtype == bool
    masks_b, iou_b = pred(img_path, bboxes=[box])
    assert masks_b.shape == masks.shape
    # the predicted mask overlaps the GT box region in the letterboxed frame
    gain, (px, py), _ = pred._geom
    s4 = pred.imgsz // 4
    gx1, gy1, gx2, gy2 = ((box * gain) + [px, py, px, py]) / 4
    gt = np.zeros((s4, s4), bool)
    gt[int(gy1) : int(gy2) + 1, int(gx1) : int(gx2) + 1] = True
    for m in (masks[0], masks_b[0]):
        inter = (m & gt).sum()
        assert inter / max(m.sum(), 1) > 0.4, "mask strays far from the prompt's object"
    # everything mode: grid prompts -> deduped masks with quality scores
    am, aq = pred.everything(img_path, grid=4, iou_thresh=0.0, dedup_iou=0.8)
    assert am.ndim == 3 and len(am) == len(aq)
    assert len(am) >= 1


def test_fastsam_prompt_selection(seg_dataset, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.models.fastsam import FastSAMPredictor
    from kuzu.tasks.segment import SegmentTrainer

    cfg = load_config(
        overrides=dict(
            task="segment", model="yolov8n-seg", data=str(seg_dataset),
            epochs=2, batch=4, imgsz=64, max_boxes=8, workers=0,
            dtype="float32", project=str(tmp_path / "runs"), name="fs",
            exist_ok=True, val_batches=1, optimizer="adamw",
            warmup_epochs=0.0, lr0=0.002,
        )
    )
    trainer = SegmentTrainer(cfg)
    trainer.train()
    pred = FastSAMPredictor(
        dict(model=str(trainer.save_dir), conf=0.0001, task="segment")
    )
    img = seg_dataset.parent / "images" / "val" / "0.jpg"
    everything = pred(img)
    assert len(everything) == 1
    n_all = len(everything[0].boxes)
    if n_all == 0:
        pytest.skip("2-epoch toy detector produced no proposals")
    # box prompt selects exactly one instance
    sel = pred(img, bboxes=[[10, 10, 60, 60]])
    assert len(sel[0].boxes) == 1
    assert sel[0].masks is None or len(sel[0].masks) == 1
    # point prompt: background-only point keeps the complement semantics
    sel_pt = pred(img, points=[[2, 2]], labels=[0])
    assert len(sel_pt[0].boxes) <= n_all
    # text prompts are explicitly gated (CLIP absent under zero egress)
    with pytest.raises(NotImplementedError):
        pred(img, texts="a red square")
