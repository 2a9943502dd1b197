"""Data-parallel inference: ``dp=N`` shards host-facing batches over a
1-axis device mesh and replicates the weights, so the SAME jitted predictor
programs compile GSPMD-partitioned (scaling-book recipe: annotate input
shardings, let XLA insert collectives).

The SURVEY north star is pages/s on a v5e-8 — training has sharded from
round 1, these tests pin the *inference* path: every predictor and the
cascade accept ``dp`` and produce results identical to single-device
execution (batch-dim partitioning does not change per-example math).

Runs on the 8-device CPU mesh from conftest.
"""

import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw


# ------------------------------------------------------------- fixtures


@pytest.fixture(scope="module")
def det_run(tmp_path_factory):
    """Tiny trained detect run (shared across dp tests)."""
    root = tmp_path_factory.mktemp("dpdet")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = Image.new("RGB", (96, 96), (240, 240, 235))
            d = ImageDraw.Draw(img)
            rows = []
            for _ in range(2):
                w, h = int(rng.integers(16, 32)), int(rng.integers(16, 32))
                x = int(rng.integers(0, 96 - w))
                y = int(rng.integers(0, 96 - h))
                d.rectangle([x, y, x + w, y + h], fill=(220, 40, 40))
                rows.append(
                    f"0 {(x + w / 2) / 96:.6f} {(y + h / 2) / 96:.6f} "
                    f"{w / 96:.6f} {h / 96:.6f}"
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

    from kuzu.core.config import load_config
    from kuzu.tasks.detect import DetectTrainer

    cfg = load_config(
        overrides=dict(
            task="detect", model="yolov12n", data=str(yml), epochs=1,
            batch=4, imgsz=64, max_boxes=8, lr0=0.002, optimizer="adamw",
            warmup_epochs=0.0, close_mosaic=0, project=str(root / "runs"),
            name="d", exist_ok=True, workers=0, dtype="float32",
            val_batches=1,
        )
    )
    trainer = DetectTrainer(cfg)
    trainer.train()
    return yml, trainer.save_dir


def _predict(yml, run_dir, dp):
    from kuzu.core.config import load_config
    from kuzu.tasks.detect import DetectPredictor

    pred = DetectPredictor(
        load_config(
            overrides=dict(
                task="detect", data=str(yml), model=str(run_dir),
                conf=0.001, dp=dp, workers=0,
            )
        )
    )
    imgs = sorted((yml.parent / "images" / "val").glob("*.jpg"))[:3]
    return pred, pred([str(p) for p in imgs])


def test_detect_dp_equals_single(det_run):
    yml, run_dir = det_run
    _, base = _predict(yml, run_dir, dp=0)
    pred8, dp = _predict(yml, run_dir, dp=8)
    # weights replicated over the full mesh
    import jax

    leaf = jax.tree.leaves(pred8.variables)[0]
    assert len(leaf.sharding.device_set) == 8
    assert len(base) == len(dp) == 3
    for a, b in zip(base, dp):
        assert len(a["boxes"]) == len(b["boxes"])
        if len(a["boxes"]):
            np.testing.assert_allclose(
                a["boxes"], b["boxes"], rtol=1e-4, atol=1e-3
            )
            np.testing.assert_allclose(
                a["scores"], b["scores"], rtol=1e-4, atol=1e-5
            )


def test_detect_dp_bucket_divisible(det_run):
    """dp sets the minimum batch bucket so shards divide evenly: a single
    frame must pad to the mesh size, not to 1."""
    yml, run_dir = det_run
    pred, _ = _predict(yml, run_dir, dp=8)
    assert pred.min_bucket == 8
    img = sorted((yml.parent / "images" / "val").glob("*.jpg"))[0]
    out = pred([str(img)])  # 1 frame -> padded to 8 internally
    assert len(out) == 1


@pytest.fixture(scope="module")
def rec_run(tmp_path_factory):
    """Tiny trained recognize run + its one-line dataset."""
    root = tmp_path_factory.mktemp("dprec")
    texts = ["abc", "bca", "cab", "aabb", "ccba", "abca"]

    def _line(text):
        img = Image.new("RGB", (256, 64), (255, 255, 255))
        d = ImageDraw.Draw(img)
        for i, ch in enumerate(text):
            x = 10 + i * 40
            c = {"a": (0, 0, 0), "b": (180, 0, 0), "c": (0, 0, 180)}[ch]
            d.rectangle([x, 10, x + 30, 50], fill=c)
        return img

    for split, ts in (("train", texts * 2), ("val", texts[:3])):
        (root / split / "images" / "b").mkdir(parents=True)
        (root / split / "labels" / "b").mkdir(parents=True)
        for i, t in enumerate(ts):
            _line(t).save(root / split / "images" / "b" / f"{i}.png")
            (root / split / "labels" / "b" / f"{i}.txt").write_text(t)

    from kuzu.core.config import load_config
    from kuzu.tasks.recognize import RecognizeTrainer

    cfg = load_config(
        overrides=dict(
            task="recognize", data=str(root), epochs=1, batch=6,
            imgsz=[64, 256], patch=16, enc_dim=32, enc_depth=1, enc_heads=2,
            dec_dim=32, dec_depth=1, dec_heads=2, max_label_length=8,
            optimizer="adamw", warmup_epochs=0.0,
            project=str(root / "runs"), name="r", exist_ok=True,
            workers=0, dtype="float32",
        )
    )
    trainer = RecognizeTrainer(cfg)
    trainer.train()
    return root, trainer.save_dir


def test_recognize_dp_equals_single(rec_run):
    from kuzu.core.config import load_config
    from kuzu.tasks.recognize import RecognizePredictor

    root, run_dir = rec_run
    imgs = [
        str(p) for p in sorted((root / "val" / "images" / "b").glob("*.png"))
    ]
    base = RecognizePredictor(
        load_config(overrides=dict(model=str(run_dir)))
    )(imgs)
    dp = RecognizePredictor(
        load_config(overrides=dict(model=str(run_dir), dp=8))
    )(imgs)
    assert base == dp  # per-example decode; batch sharding changes nothing


def test_recognize_tp_and_dpxtp_equal_single(rec_run):
    """tp=M shards the recognizer's weights over the model axis with the
    same path rules as TP training; dp=4 x tp=2 composes. Per-example
    results stay identical to single-device."""
    import jax

    from kuzu.core.config import load_config
    from kuzu.tasks.recognize import RecognizePredictor

    root, run_dir = rec_run
    imgs = [
        str(p) for p in sorted((root / "val" / "images" / "b").glob("*.png"))
    ]
    base = RecognizePredictor(
        load_config(overrides=dict(model=str(run_dir)))
    )(imgs)

    tp_pred = RecognizePredictor(
        load_config(overrides=dict(model=str(run_dir), tp=2))
    )
    assert tp_pred(imgs) == base
    # an attention/MLP kernel is actually sharded over the model axis
    from jax.sharding import PartitionSpec as P

    flat = jax.tree_util.tree_flatten_with_path(tp_pred.params)[0]
    sharded = [
        (p, l) for p, l in flat
        if getattr(l.sharding, "spec", P()) != P() and l.ndim == 2
    ]
    assert sharded, "tp=2 left every kernel replicated"

    dpxtp = RecognizePredictor(
        load_config(overrides=dict(model=str(run_dir), dp=4, tp=2))
    )
    assert dpxtp(imgs) == base
    assert dpxtp.min_bucket == 4  # data axis only


def test_cascade_tiled_dp_equals_single(det_run, rec_run):
    """The full tiled cascade (column det -> tiled char det -> crop ->
    recognize) with dp=8 produces the same pages as single-device —
    exercises the dp-divisible bucket floors and the tiled-batch padding
    (both had real bugs: under-padding via zeros_like(stack[:pad]) and
    max(8, mesh) floors that mesh sizes not dividing 8 break)."""
    from kuzu.pipeline.cascade import KuzushijiPipeline

    yml, det_dir = det_run
    _, rec_dir = rec_run
    pages = [
        str(p) for p in sorted((yml.parent / "images" / "val").glob("*.jpg"))[:3]
    ]

    def run(dp):
        pipe = KuzushijiPipeline(
            column_model=det_dir, char_model=det_dir, recognizer=rec_dir,
            tile_grid=2, conf=0.01, max_det=8, dp=dp,
        )
        return pipe.process_pages(pages)

    base, sharded = run(0), run(8)
    assert len(base) == len(sharded) == 3
    for a, b in zip(base, sharded):
        assert a.get("text") == b.get("text")
        assert len(a["columns"]) == len(b["columns"])
        for ca, cb in zip(a["columns"], b["columns"]):
            np.testing.assert_allclose(ca["box"], cb["box"], rtol=1e-4, atol=1e-3)
        na = np.asarray(a["characters"]["boxes"])
        nb = np.asarray(b["characters"]["boxes"])
        assert na.shape == nb.shape
        if na.size:
            np.testing.assert_allclose(na, nb, rtol=1e-4, atol=1e-3)


def test_pipeline_lm_rescore_dp(tmp_path_factory):
    """The cascade's jitted LM rescore runs sharded when the pipeline gets
    dp=N (same pseudo-log-likelihoods as single-device)."""
    root = tmp_path_factory.mktemp("dplm")
    corpus = root / "corpus.txt"
    corpus.write_text("\n".join(["あいうえお", "かきくけこ", "さしすせそ"] * 8))

    from kuzu.core.config import load_config
    from kuzu.tasks.lm import LMTrainer

    cfg = load_config(
        overrides=dict(
            task="lm", data=str(corpus), epochs=1, batch=8, dim=32, depth=1,
            heads=2, max_length=16, optimizer="adamw", warmup_epochs=0.0,
            project=str(root / "runs"), name="lm", exist_ok=True,
            workers=0, dtype="float32",
        )
    )
    trainer = LMTrainer(cfg)
    trainer.train()

    from kuzu.pipeline.cascade import KuzushijiPipeline

    texts = ["あいうえお", "かきあけこ"]
    base = KuzushijiPipeline(lm=trainer.save_dir).rescore_texts(texts)
    dp = KuzushijiPipeline(lm=trainer.save_dir, dp=8).rescore_texts(texts)
    np.testing.assert_allclose(base, dp, rtol=1e-4, atol=1e-5)
