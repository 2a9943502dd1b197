"""CTC CRNN task end-to-end on synthetic vertical text columns."""

import json

import numpy as np
import pytest
from PIL import Image, ImageDraw

TEXTS = ["abc", "bca", "cab", "acb", "bac", "cba"]


def _column_image(text: str, size=(128, 32)) -> Image.Image:
    """Vertical arrangement: one colored block per char, top to bottom."""
    img = Image.new("RGB", (size[1], size[0]), (255, 255, 255))
    d = ImageDraw.Draw(img)
    boxes = []
    for i, ch in enumerate(text):
        y = 6 + i * 40
        c = {"a": (0, 0, 0), "b": (180, 0, 0), "c": (0, 0, 180)}[ch]
        d.rectangle([4, y, 28, y + 30], fill=c)
        boxes.append([4, y, 28, y + 30])
    return img, boxes


@pytest.fixture(scope="module")
def column_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("columns")
    for split, texts in (("train", TEXTS * 3), ("val", TEXTS[:3])):
        for sub in ("images", "labels", "bounding_boxes"):
            (root / split / sub / "b1").mkdir(parents=True, exist_ok=True)
        for i, t in enumerate(texts):
            img, boxes = _column_image(t)
            img.save(root / split / "images" / "b1" / f"{i}.png")
            (root / split / "labels" / "b1" / f"{i}.txt").write_text(t)
            (root / split / "bounding_boxes" / "b1" / f"{i}.json").write_text(
                json.dumps(boxes)
            )
    return root


def test_crnn_forward_shapes():
    import jax
    import jax.numpy as jnp

    from kuzu.models.crnn import CRNN

    model = CRNN(num_classes=10, lstm_hidden=32, max_boxes=5)
    imgs = jnp.zeros((2, 128, 32, 3))
    v = model.init(jax.random.key(0), imgs)
    (logits, boxes), _ = model.apply(v, imgs, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 32, 10)  # T = H/4
    assert boxes.shape == (2, 5, 4)
    assert (np.asarray(boxes) >= 0).all() and (np.asarray(boxes) <= 1).all()


def test_ctc_trainer_end_to_end(column_root, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.ctc import CTCTrainer

    cfg = load_config(
        overrides=dict(
            task="ctc",
            data=str(column_root),
            epochs=2,
            batch=6,
            imgsz=[128, 32],
            max_label_length=8,
            max_boxes=4,
            lstm_hidden=32,
            lr0=0.002,
            optimizer="adamw",
            warmup_epochs=0.0,
            project=str(tmp_path / "runs"),
            name="ctc",
            exist_ok=True,
            workers=0,
            dtype="float32",
        )
    )
    trainer = CTCTrainer(cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"])
    assert "cer" in result
    assert "box_loss" in result
    assert (trainer.save_dir / "tokenizer.json").exists()


def test_ctc_predictor_roundtrip(column_root, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.ctc import CTCPredictor, CTCTrainer

    cfg = load_config(
        overrides=dict(
            task="ctc", data=str(column_root), epochs=1, batch=6,
            imgsz=[128, 32], max_label_length=8, max_boxes=4, lstm_hidden=32,
            optimizer="adamw", warmup_epochs=0.0, workers=0, dtype="float32",
            project=str(tmp_path / "runs"), name="ctcp", exist_ok=True,
        )
    )
    trainer = CTCTrainer(cfg)
    trainer.train()
    predictor = CTCPredictor(load_config(overrides={"model": str(trainer.save_dir)}))
    imgs = sorted((column_root / "val" / "images" / "b1").glob("*.png"))[:2]
    out = predictor(imgs)
    assert len(out) == 2
    assert all(isinstance(t, str) for t in out)


def test_ctc_trainer_column_info_csv(tmp_path):
    """CTC on the production column_info.csv schema (same data as TrOCR)."""
    import pandas as pd

    from kuzu.core.config import load_config
    from kuzu.tasks.ctc import CTCTrainer

    root = tmp_path / "colinfo"
    (root / "imgs").mkdir(parents=True)
    rows = []
    for i, t in enumerate(TEXTS * 2):
        img, _ = _column_image(t)
        img.save(root / "imgs" / f"{i}.png")
        uni = " ".join(f"U+{ord(c):04X}" for c in t)
        rows.append({"column_image": f"imgs/{i}.png", "unicode_ids": uni})
    pd.DataFrame(rows).to_csv(root / "column_info.csv", index=False)

    cfg = load_config(
        overrides=dict(
            task="ctc", data=str(root / "column_info.csv"), epochs=1, batch=4,
            imgsz=[128, 32], max_label_length=8, lstm_hidden=32,
            optimizer="adamw", warmup_epochs=0.0, workers=0, dtype="float32",
            project=str(tmp_path / "runs"), name="ctccsv", exist_ok=True,
        )
    )
    trainer = CTCTrainer(cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"])
    assert "cer" in result
    # csv datasets emit raw uint8 (models normalize on-device)
    assert trainer.train_ds[0]["image"].dtype == np.uint8
