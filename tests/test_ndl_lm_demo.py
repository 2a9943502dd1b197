"""ndl-minhon cropper + LM demo harness tests."""

import json

import numpy as np
import pytest
from PIL import Image


def test_crop_oneline_dataset(tmp_path):
    from kuzu.tools.ndl_dataset import crop_oneline_dataset

    img_root = tmp_path / "img" / "book1"
    ann_root = tmp_path / "ann" / "book1"
    img_root.mkdir(parents=True)
    ann_root.mkdir(parents=True)
    Image.new("RGB", (200, 300), (240,) * 3).save(img_root / "p1.jpg")
    words = [
        {"boundingBox": [[10, 10], [60, 10], [60, 200], [10, 200]], "text": "あいう"},
        {"boundingBox": [[80, 10], [130, 10], [130, 180], [80, 180]], "text": "えおか"},
        {"boundingBox": [[0, 0], [2, 0], [2, 2], [0, 2]], "text": "tiny"},  # filtered
        {"boundingBox": [[140, 10], [190, 10], [190, 180], [140, 180]], "text": ""},
    ]
    (ann_root / "p1.json").write_text(json.dumps(words), encoding="utf-8")
    n = crop_oneline_dataset(tmp_path / "img", tmp_path / "ann", tmp_path / "out")
    assert n == 2
    imgs = list((tmp_path / "out/train/images/book1").glob("*.png"))
    lbls = list((tmp_path / "out/train/labels/book1").glob("*.txt"))
    assert len(imgs) == 2 and len(lbls) == 2
    assert lbls[0].read_text(encoding="utf-8") in ("あいう", "えおか")
    # crops match the annotation extents
    with Image.open(sorted(imgs)[0]) as im:
        assert im.size == (50, 190)


@pytest.fixture(scope="module")
def lm_run(tmp_path_factory):
    from kuzu.core.config import load_config
    from kuzu.tasks.lm import LMTrainer

    d = tmp_path_factory.mktemp("lmdemo")
    corpus = ["あめつちほしそら", "やまかはみねたに"] * 6
    (d / "train.txt").write_text("\n".join(corpus), encoding="utf-8")
    cfg = load_config(
        overrides=dict(
            task="lm", data=str(d), epochs=1, batch=4, max_length=12, dim=32,
            depth=1, heads=2, project=str(d / "runs"), name="x", exist_ok=True,
            workers=0, dtype="float32", optimizer="adamw", warmup_epochs=0.0,
        )
    )
    t = LMTrainer(cfg)
    t.train()
    return {"run": t.save_dir, "corpus": d / "train.txt"}


def test_lm_demo_topk_and_batch(lm_run):
    from kuzu.tools.lm_demo import _load, batch_eval, topk_predictions

    predictor = _load(str(lm_run["run"]))
    preds = topk_predictions(predictor, "あめつ〓ほしそら", k=3)
    assert len(preds) == 1 and len(preds[0]) == 3
    for c, p in preds[0]:
        assert 0 <= p <= 1
    res = batch_eval(predictor, str(lm_run["corpus"]), mask_prob=0.2, seed=0)
    assert 0.0 <= res["masked_acc"] <= 1.0
    assert res["n_masks"] > 0


def test_lm_demo_cli(lm_run, capsys):
    from kuzu.tools.lm_demo import main

    rc = main(["--model", str(lm_run["run"]), "--text", "あめつ〓ほしそら"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "restored:" in out and "mask 0:" in out
