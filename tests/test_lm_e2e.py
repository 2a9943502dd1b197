"""Char-MLM task end-to-end: masking, training, restoration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kuzu.models.lm import apply_mlm_masking

CORPUS = [
    "あめつちほしそら",
    "やまかはみねたに",
    "くもきりむろこけ",
    "ひとねずみいぬうへ",
    "すゑゆわさるおふせよ",
    "えのえをなれゐて",
] * 4


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "train.txt").write_text("\n".join(CORPUS), encoding="utf-8")
    (d / "val.txt").write_text("\n".join(CORPUS[:6]), encoding="utf-8")
    return d


def test_mlm_masking_properties():
    rng = jax.random.key(0)
    tokens = jnp.asarray(np.random.default_rng(0).integers(5, 50, (8, 64)))
    masked, labels = apply_mlm_masking(tokens, rng, mask_id=4, vocab_size=50)
    sel = np.asarray(labels >= 0)
    frac = sel.mean()
    assert 0.08 < frac < 0.25  # ~15%
    # unmasked positions unchanged, labels -100
    np.testing.assert_array_equal(
        np.asarray(masked)[~sel], np.asarray(tokens)[~sel]
    )
    assert (np.asarray(labels)[~sel] == -100).all()
    # labels hold originals at masked positions
    np.testing.assert_array_equal(np.asarray(labels)[sel], np.asarray(tokens)[sel])
    # specials (ids < 5) never selected
    specials = np.asarray(tokens) < 5
    assert not (sel & specials).any()


def test_mlm_masking_respects_pad():
    rng = jax.random.key(1)
    tokens = jnp.zeros((2, 16), jnp.int32)  # all pad
    masked, labels = apply_mlm_masking(tokens, rng, mask_id=4, vocab_size=50)
    assert (np.asarray(labels) == -100).all()


def test_lm_trainer_end_to_end(corpus_dir, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.lm import LMTrainer

    cfg = load_config(
        overrides=dict(
            task="lm",
            data=str(corpus_dir),
            epochs=3,
            batch=8,
            max_length=16,
            dim=32,
            depth=1,
            heads=2,
            lr0=0.003,
            optimizer="adamw",
            warmup_epochs=0.0,
            project=str(tmp_path / "runs"),
            name="lm",
            exist_ok=True,
            workers=0,
            dtype="float32",
        )
    )
    trainer = LMTrainer(cfg)
    result = trainer.train()
    assert "masked_acc" in result
    assert 0.0 <= result["masked_acc"] <= 1.0
    assert (trainer.save_dir / "tokenizer.json").exists()


def test_lm_restoration_predictor(corpus_dir, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.lm import LMPredictor, LMTrainer

    cfg = load_config(
        overrides=dict(
            task="lm", data=str(corpus_dir), epochs=1, batch=8, max_length=16,
            dim=32, depth=1, heads=2, project=str(tmp_path / "runs"),
            name="lmr", exist_ok=True, workers=0, dtype="float32",
            warmup_epochs=0.0, optimizer="adamw",
        )
    )
    trainer = LMTrainer(cfg)
    trainer.train()
    pred_cfg = load_config(overrides={"model": str(trainer.save_dir)})
    predictor = LMPredictor(pred_cfg)
    out = predictor("あめつち〓しそら")
    assert len(out) == 1
    assert "〓" not in out[0]
    assert len(out[0]) == 8  # restored to full length


def test_auto_optimizer_resolves_per_task(tmp_path):
    """optimizer='auto' resolves task-aware: adamw (lr 3e-4) for the
    transformer tasks, sgd for detect — from-scratch transformers stall
    under the YOLO SGD rule (production TrOCR plateaued at CER ~0.9)."""
    from kuzu.core.config import load_config
    from kuzu.tasks.ctc import CTCTrainer
    from kuzu.tasks.detect import DetectTrainer
    from kuzu.tasks.lm import LMTrainer
    from kuzu.tasks.recognize import RecognizeTrainer

    assert DetectTrainer.auto_optimizer == "sgd"
    assert RecognizeTrainer.auto_optimizer == "adamw"
    assert LMTrainer.auto_optimizer == "adamw"
    assert CTCTrainer.auto_optimizer == "adamw"

    (tmp_path / "corpus").mkdir()
    (tmp_path / "corpus" / "train.txt").write_text("abcab\nbcabc\ncabca\n" * 8)
    (tmp_path / "corpus" / "val.txt").write_text("abcab\n")
    cfg = load_config(
        overrides=dict(
            task="lm", data=str(tmp_path / "corpus"), epochs=1, batch=4,
            max_length=8, dim=16, depth=1, heads=2, workers=0,
            dtype="float32", project=str(tmp_path / "runs"), name="auto",
            exist_ok=True,
        )
    )
    assert cfg.get("optimizer", "auto") == "auto"
    t = LMTrainer(cfg)
    t.train()
    assert t.cfg.optimizer == "adamw" and float(t.cfg.lr0) == 3e-4
