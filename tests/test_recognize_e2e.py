"""End-to-end recognize task: synthetic one-line + column_info datasets."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image, ImageDraw

TEXTS = ["abc", "bca", "cab", "aabb", "ccba", "abca"]


def _line_image(text: str, size=(64, 256)) -> Image.Image:
    """Render distinguishable blocks per char (no font dependency)."""
    img = Image.new("RGB", (size[1], size[0]), (255, 255, 255))
    d = ImageDraw.Draw(img)
    for i, ch in enumerate(text):
        x = 10 + i * 40
        c = {"a": (0, 0, 0), "b": (180, 0, 0), "c": (0, 0, 180)}[ch]
        d.rectangle([x, 10, x + 30, 50], fill=c)
    return img


@pytest.fixture(scope="module")
def oneline_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("oneline")
    for split, texts in (("train", TEXTS * 3), ("val", TEXTS[:3])):
        for book in ("book1",):
            (root / split / "images" / book).mkdir(parents=True, exist_ok=True)
            (root / split / "labels" / book).mkdir(parents=True, exist_ok=True)
            for i, t in enumerate(texts):
                _line_image(t).save(root / split / "images" / book / f"{i}.png")
                (root / split / "labels" / book / f"{i}.txt").write_text(t)
    return root


@pytest.fixture(scope="module")
def column_info_csv(tmp_path_factory):
    import pandas as pd

    root = tmp_path_factory.mktemp("colinfo")
    (root / "imgs").mkdir()
    rows = []
    for i, t in enumerate(TEXTS * 2):
        p = root / "imgs" / f"{i}.png"
        _line_image(t).save(p)
        uni = " ".join(f"U+{ord(c):04X}" for c in t)
        rows.append({"column_image": f"imgs/{i}.png", "unicode_ids": uni})
    pd.DataFrame(rows).to_csv(root / "column_info.csv", index=False)
    return root / "column_info.csv"


def _cfg(data, tmp_path, **kw):
    from kuzu.core.config import load_config

    base = dict(
        task="recognize",
        data=str(data),
        epochs=2,
        batch=6,
        imgsz=[64, 256],
        patch=16,
        enc_dim=32,
        enc_depth=1,
        enc_heads=2,
        dec_dim=32,
        dec_depth=1,
        dec_heads=2,
        max_label_length=8,
        lr0=0.002,
        optimizer="adamw",
        warmup_epochs=0.0,
        project=str(tmp_path / "runs"),
        name="t",
        exist_ok=True,
        workers=0,
        dtype="float32",
    )
    base.update(kw)
    return load_config(overrides=base)


def test_oneline_dataset_shapes(oneline_root):
    from kuzu.data.ocr_datasets import OneLineDataset, build_tokenizer_from_datasets

    probe = OneLineDataset(oneline_root, None, split="train", image_size=(64, 256))
    tok = build_tokenizer_from_datasets(probe)
    assert len(tok) == 5 + 3  # specials + a, b, c
    ds = OneLineDataset(
        oneline_root, tok, split="train", image_size=(64, 256), max_length=8
    )
    s = ds[0]
    assert s["image"].shape == (64, 256, 3)
    assert s["tokens"].shape == (8,)
    assert s["tokens"][0] == tok.bos_id
    assert int(s["length"]) == 2 + len(TEXTS[0])


def test_column_info_dataset(column_info_csv):
    from kuzu.data.ocr_datasets import ColumnInfoDataset
    from kuzu.data.tokenizer import CharTokenizer

    tok = CharTokenizer.train(TEXTS)
    ds = ColumnInfoDataset(
        column_info_csv, tok, split="train", image_size=(64, 256), max_length=8
    )
    assert len(ds) == int(12 * 0.8)
    s = ds[0]
    assert s["image"].shape == (64, 256, 3)
    # unicode decoding round-trips
    assert tok.decode(s["tokens"]) == TEXTS[0]
    # cache_images=ram: bitwise-identical samples, including augmented ones
    # on a SECOND read (guards against mutation of the cached decode)
    cached = ColumnInfoDataset(
        column_info_csv, tok, split="train", image_size=(64, 256),
        max_length=8, augment=True, cache_images="ram",
    )
    plain = ColumnInfoDataset(
        column_info_csv, tok, split="train", image_size=(64, 256),
        max_length=8, augment=True,
    )
    for i in (0, 3):
        np.testing.assert_array_equal(plain[i]["image"], cached[i]["image"])
        np.testing.assert_array_equal(plain[i]["image"], cached[i]["image"])
    assert cached._img_cache[0] is not None


def test_recognize_trainer_end_to_end(oneline_root, tmp_path):
    from kuzu.tasks.recognize import RecognizeTrainer

    cfg = _cfg(oneline_root, tmp_path)
    trainer = RecognizeTrainer(cfg)
    result = trainer.train()
    assert "cer" in result
    assert (trainer.save_dir / "tokenizer.json").exists()
    assert (trainer.save_dir / "weights" / "best").exists()


def test_recognize_trainer_csv_data(column_info_csv, tmp_path):
    from kuzu.tasks.recognize import RecognizeTrainer

    cfg = _cfg(column_info_csv, tmp_path, epochs=1, name="csv")
    result = RecognizeTrainer(cfg).train()
    assert "fitness" in result


def test_joint_ctc_scheduled_sampling(column_info_csv, tmp_path):
    """Anti-collapse training options (production v4 fix): joint
    CTC+attention (`ctc_weight`) + scheduled sampling (`ss_prob`) train end
    to end, produce a finite decreasing loss, and the `ctc_proj`-bearing
    checkpoint restores through the standard predictor."""
    from kuzu.core.config import load_config
    from kuzu.tasks.recognize import RecognizePredictor, RecognizeTrainer

    cfg = _cfg(
        column_info_csv, tmp_path, epochs=2, name="joint",
        ctc_weight=0.3, ss_prob=0.3,
    )
    trainer = RecognizeTrainer(cfg)
    result = trainer.train()
    assert "cer" in result
    # the joint loss created the encoder CTC head
    assert "ctc_proj" in trainer.state.params
    pred = RecognizePredictor(
        load_config(overrides={"model": str(trainer.save_dir)})
    )
    img = Path(column_info_csv).parent / "imgs" / "0.png"
    out = pred([img])
    assert isinstance(out[0], str)


def test_beam_validation_beats_or_ties_greedy(oneline_root, tmp_path):
    """Beam-4 validation wired end to end (reference num_beams=4,
    src/models/trocr_model.py:303-316): beam CER <= greedy CER once the toy
    model has converged."""
    from kuzu.tasks.recognize import RecognizeTrainer

    cfg = _cfg(oneline_root, tmp_path, epochs=20, name="beam", patience=50)
    trainer = RecognizeTrainer(cfg)
    trainer.train()
    state = trainer.state
    greedy = trainer.validate(state)["cer"]
    trainer.cfg["decode"] = "beam"
    trainer.cfg["num_beams"] = 4
    beam = trainer.validate(state)["cer"]
    assert beam <= greedy + 1e-6, (beam, greedy)
