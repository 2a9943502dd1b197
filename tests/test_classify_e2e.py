"""End-to-end minimum-slice tests: SimpleViT classify on synthetic glyphs.

Mirrors the reference's test strategy (SURVEY.md §4): synthetic dataset
fixture + 1-epoch trainer smoke + subprocess CLI test + resume.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def glyph_dir(tmp_path_factory):
    """root/{train,val}/U+XXXX/*.png with class-distinguishable images."""
    root = tmp_path_factory.mktemp("glyphs")
    rng = np.random.default_rng(0)
    classes = ["U+3042", "U+3044", "U+3046"]
    for split, n in (("train", 8), ("val", 4)):
        for ci, name in enumerate(classes):
            d = root / split / name
            d.mkdir(parents=True)
            for i in range(n):
                # class ci = bright square in a distinct corner
                arr = rng.integers(0, 60, size=(32, 32), dtype=np.uint8)
                y, x = divmod(ci, 2)
                arr[y * 16 : y * 16 + 16, x * 16 : x * 16 + 16] = 220
                Image.fromarray(arr, "L").save(d / f"{i}.png")
    return root


def _train_cfg(glyph_dir, tmp_path, **kw):
    from kuzu.core.config import load_config

    base = dict(
        task="classify",
        data=str(glyph_dir),
        epochs=2,
        batch=8,
        imgsz=32,
        patch=8,
        dim=32,
        depth=1,
        heads=2,
        lr0=0.001,
        optimizer="adamw",
        warmup_epochs=0.0,
        project=str(tmp_path / "runs"),
        name="t",
        workers=0,
        dtype="float32",
    )
    base.update(kw)
    return load_config(overrides=base)


def test_classify_trainer_end_to_end(glyph_dir, tmp_path):
    from kuzu.tasks.classify import ClassifyTrainer

    cfg = _train_cfg(glyph_dir, tmp_path)
    trainer = ClassifyTrainer(cfg)
    result = trainer.train()
    assert "fitness" in result and 0.0 <= result["fitness"] <= 1.0
    # artifacts
    assert (trainer.save_dir / "args.yaml").exists()
    assert (trainer.save_dir / "results.csv").exists()
    assert (trainer.save_dir / "class_map.json").exists()
    assert (trainer.save_dir / "weights" / "last").exists()
    assert (trainer.save_dir / "weights" / "best").exists()
    cm = json.loads((trainer.save_dir / "class_map.json").read_text())
    assert len(cm) == 3


def test_classify_resume(glyph_dir, tmp_path):
    from kuzu.tasks.classify import ClassifyTrainer

    cfg = _train_cfg(glyph_dir, tmp_path, epochs=1, name="r", exist_ok=True)
    t1 = ClassifyTrainer(cfg)
    t1.train()
    cfg2 = _train_cfg(
        glyph_dir, tmp_path, epochs=2, name="r", exist_ok=True, resume=True
    )
    t2 = ClassifyTrainer(cfg2)
    t2.train()
    assert t2.epoch == 1  # continued at epoch 1, not 0


def test_classify_learns_separable_data(glyph_dir, tmp_path):
    """Corner-square classes are trivially separable: accuracy must climb."""
    from kuzu.tasks.classify import ClassifyTrainer

    cfg = _train_cfg(glyph_dir, tmp_path, epochs=12, name="learn", lr0=0.003)
    result = ClassifyTrainer(cfg).train()
    assert result["acc"] > 0.6, f"val acc too low: {result}"


def test_cli_subprocess_train(glyph_dir, tmp_path):
    """Reference test_train_script.py pattern: headless CLI run, rc 0, ckpt."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["KUZU_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "kuzu.api.cli",
            "train",
            "classify",
            f"data={glyph_dir}",
            "epochs=1",
            "batch=8",
            "imgsz=32",
            "patch=8",
            "dim=32",
            "depth=1",
            "heads=2",
            "workers=0",
            "dtype=float32",
            f"project={tmp_path}/cli_runs",
            "name=cli",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Traceback" not in proc.stderr
    assert (tmp_path / "cli_runs" / "classify" / "cli" / "weights" / "last").exists()


def test_classify_predictor_roundtrip(glyph_dir, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.classify import ClassifyPredictor, ClassifyTrainer

    cfg = _train_cfg(glyph_dir, tmp_path, epochs=10, name="pred", lr0=0.003)
    trainer = ClassifyTrainer(cfg)
    trainer.train()
    predictor = ClassifyPredictor(
        load_config(overrides={"model": str(trainer.save_dir)})
    )
    imgs = sorted((glyph_dir / "val" / "U+3042").glob("*.png"))[:2]
    out = predictor(imgs)
    assert len(out) == 2
    for r in out:
        assert r["name"].startswith("U+")
        assert 0.0 <= r["confidence"] <= 1.0


def test_yolo_cls_trainer_end_to_end(glyph_dir, tmp_path):
    """YOLO-backbone classifier (reference ClassificationModel +
    Classify head, nn/modules/head.py:282): trains through the BatchNorm
    model-state path and round-trips through the predictor."""
    from kuzu.core.config import load_config
    from kuzu.tasks.classify import ClassifyPredictor, ClassifyTrainer

    cfg = load_config(
        overrides=dict(
            task="classify", model="yolov8n-cls", data=str(glyph_dir),
            epochs=2, batch=8, imgsz=32, workers=0, dtype="float32",
            optimizer="adamw", lr0=0.003, warmup_epochs=0.0,
            project=str(tmp_path / "runs"), name="ycls", exist_ok=True,
        )
    )
    trainer = ClassifyTrainer(cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"]) and 0.0 <= result["acc"] <= 1.0
    assert trainer._model_state is not None  # BatchNorm stats tracked

    pred = ClassifyPredictor(
        load_config(overrides=dict(task="classify", model=str(trainer.save_dir)))
    )
    imgs = sorted((glyph_dir / "train").rglob("*.png"))[:2]
    out = pred([str(p) for p in imgs])
    assert len(out) == 2 and all(0 <= o["confidence"] <= 1 for o in out)
