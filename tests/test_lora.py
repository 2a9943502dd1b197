"""LoRA/PEFT fine-tuning (reference ``scripts/qwen3_vl_cft_sft.py``: frozen
VLM base + rank-r adapters via unsloth/TRL — here a generic parameter
transform on any kuzu trainer, ``kuzu/core/lora.py``).

Pins the PEFT contract:
- adapters start as an exact identity (b=0 -> merged == base);
- training moves ONLY the adapters — the base tree is bitwise frozen;
- checkpoints round-trip through the predictor, which fuses at load;
- the native ``finetune_vlm`` backend runs end-to-end on columns.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageDraw

TEXTS = ["abc", "bca", "cab", "aabb", "ccba", "abca"]


def _line_image(text: str, size=(64, 256)) -> Image.Image:
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
        (root / split / "images" / "b").mkdir(parents=True, exist_ok=True)
        (root / split / "labels" / "b").mkdir(parents=True, exist_ok=True)
        for i, t in enumerate(texts):
            _line_image(t).save(root / split / "images" / "b" / f"{i}.png")
            (root / split / "labels" / "b" / f"{i}.txt").write_text(t)
    return root


def _rec_cfg(oneline_root, tmp_path, **kw):
    from kuzu.core.config import load_config

    base = dict(
        task="recognize", data=str(oneline_root), epochs=2, batch=6,
        imgsz=[64, 256], patch=16, enc_dim=32, enc_depth=1, enc_heads=2,
        dec_dim=32, dec_depth=1, dec_heads=2, max_label_length=8,
        lr0=0.002, optimizer="adamw", warmup_epochs=0.0,
        project=str(tmp_path / "runs"), name="t", exist_ok=True,
        workers=0, dtype="float32",
    )
    base.update(kw)
    return load_config(overrides=base)


# ------------------------------------------------------------------- core


def test_init_merge_identity_and_math():
    from kuzu.core import lora

    params = {
        "enc": {
            "q": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros(8)},
            "embed": {"embedding": jnp.ones((10, 8))},
        },
        "conv": {"kernel": jnp.ones((3, 3, 4, 4))},
    }
    lp = lora.init_lora(jax.random.key(0), params, rank=2)
    # only the 2-D kernel qualifies (embedding by name, conv by rank)
    assert list(lp) == ["enc.q.kernel"]
    # b = 0 -> exact identity at init
    merged = lora.merge_lora(params, lp, alpha=4.0)
    np.testing.assert_array_equal(
        np.asarray(merged["enc"]["q"]["kernel"]), np.ones((8, 8))
    )
    # merge math: W + (alpha/rank) * a @ b
    lp["enc.q.kernel"]["b"] = jnp.ones((2, 8))
    merged = lora.merge_lora(params, lp, alpha=4.0)
    expect = 1.0 + 2.0 * (np.asarray(lp["enc.q.kernel"]["a"]) @ np.ones((2, 8)))
    np.testing.assert_allclose(
        np.asarray(merged["enc"]["q"]["kernel"]), expect, rtol=1e-6
    )
    # untouched leaves pass through
    np.testing.assert_array_equal(np.asarray(merged["conv"]["kernel"]), 1.0)
    comb = lora.combine(params, lp)
    assert lora.is_lora_tree(comb) and not lora.is_lora_tree(params)
    fused = lora.maybe_merge(comb)
    np.testing.assert_allclose(
        np.asarray(fused["enc"]["q"]["kernel"]), expect, rtol=1e-6
    )
    n_tr, n_tot = lora.trainable_count(comb)
    assert n_tr == 8 * 2 + 2 * 8
    with pytest.raises(ValueError, match="no parameters matched"):
        lora.init_lora(jax.random.key(0), params, rank=2, targets="nope")


# -------------------------------------------------------------- trainer e2e


def test_lora_train_freezes_base_and_roundtrips(oneline_root, tmp_path):
    """recognize + lora_rank: base bitwise frozen, adapters move, the saved
    run predicts through the standard predictor (fused at load)."""
    from kuzu.core import lora
    from kuzu.tasks.recognize import RecognizePredictor, RecognizeTrainer

    cfg = _rec_cfg(oneline_root, tmp_path, lora_rank=4, name="lora")
    trainer = RecognizeTrainer(cfg)
    res = trainer.train()
    assert "cer" in res

    state = trainer.state
    assert lora.is_lora_tree(state.params)

    # the frozen base must equal a fresh deterministic rebuild, bitwise
    ref = RecognizeTrainer(
        _rec_cfg(oneline_root, tmp_path, lora_rank=4, name="ref")
    )
    ref.train_loader, ref.val_loader = ref.build_datasets()
    p0 = ref.build_model()
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params["base"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # adapters moved: some b-matrix is non-zero after training
    bs = [np.asarray(v["b"]) for v in state.params["lora"].values()]
    assert any(np.abs(b).max() > 0 for b in bs), "adapters did not train"

    # optimizer state exists only for the adapters (multi_transform):
    # moment memory ~ trainable params, not total
    import optax

    mu_leaves = [
        l
        for l in jax.tree.leaves(state.opt_state)
        if hasattr(l, "size") and l.ndim >= 1
    ]
    n_tr, n_tot = lora.trainable_count(state.params)
    assert sum(l.size for l in mu_leaves) < n_tot  # far below full moments

    # round-trip: standard predictor fuses the adapters at load
    from kuzu.core.config import load_config

    pred = RecognizePredictor(load_config(overrides=dict(model=str(trainer.save_dir))))
    outs = pred([str(oneline_root / "val" / "images" / "b" / "0.png")])
    assert len(outs) == 1 and isinstance(outs[0], str)

    # predictor params == adapters fused from the same checkpoint it loads
    # (best-by-fitness, EMA weights)
    from kuzu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(trainer.save_dir / "weights")
    raw = mgr.restore("best" if mgr.exists("best") else "last")
    ema = raw.get("ema_params") or raw.get("params")
    fused = lora.merge_lora(
        ema["base"], ema["lora"], lora.resolve_alpha(cfg, 4)
    )
    for a, b in zip(jax.tree.leaves(fused), jax.tree.leaves(pred.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_lora_from_pretrained_base(oneline_root, tmp_path):
    """pretrained=<run> warm-starts the frozen base from a previous
    recognize run (the VLM-recipe shape: pretrained base + adapters)."""
    from kuzu.core import lora
    from kuzu.tasks.recognize import RecognizeTrainer

    base_run = RecognizeTrainer(
        _rec_cfg(oneline_root, tmp_path, epochs=2, name="base")
    )
    base_run.train()

    cfg = _rec_cfg(
        oneline_root, tmp_path, lora_rank=2,
        pretrained=str(base_run.save_dir), epochs=1, name="ft",
    )
    ft = RecognizeTrainer(cfg)
    ft.train()
    assert lora.is_lora_tree(ft.state.params)
    # the frozen base carries the pretrained (EMA) weights, not fresh init
    ema = (
        base_run.state.ema_params
        if base_run.state.ema_params is not None
        else base_run.state.params
    )
    np.testing.assert_allclose(
        np.asarray(ft.state.params["base"]["decoder"]["lm_head"]["kernel"]),
        np.asarray(ema["decoder"]["lm_head"]["kernel"]),
        rtol=1e-6,
    )
    # tokenizer followed the pretrained run
    assert (ft.save_dir / "tokenizer.json").read_text() == (
        base_run.save_dir / "tokenizer.json"
    ).read_text()


def test_lora_cross_task_classify_roundtrip(tmp_path):
    """lora_rank is a BaseTrainer feature, not a recognize special: a
    classify LoRA run must restore through the shared
    ``load_inference_params`` in both the predictor and the validator."""
    from kuzu.core import lora
    from kuzu.core.config import load_config
    from kuzu.tasks.classify import (
        ClassifyPredictor,
        ClassifyTrainer,
        ClassifyValidator,
    )

    root = tmp_path / "glyphs"
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for ci, name in enumerate(["U+3042", "U+3044"]):
            d = root / split / name
            d.mkdir(parents=True)
            for i in range(n):
                arr = rng.integers(0, 60, size=(32, 32), dtype=np.uint8)
                arr[:, ci * 16 : ci * 16 + 16] = 220
                Image.fromarray(arr, "L").save(d / f"{i}.png")

    cfg = load_config(
        overrides=dict(
            task="classify", data=str(root), epochs=2, batch=8, imgsz=32,
            patch=8, dim=32, depth=1, heads=2, lr0=0.002, optimizer="adamw",
            warmup_epochs=0.0, project=str(tmp_path / "runs"), name="lora",
            exist_ok=True, workers=0, dtype="float32", lora_rank=2,
        )
    )
    trainer = ClassifyTrainer(cfg)
    res = trainer.train()
    assert "fitness" in res
    assert lora.is_lora_tree(trainer.state.params)

    # predictor fuses at load (would raise on the typed restore otherwise)
    pred = ClassifyPredictor(
        load_config(overrides=dict(model=str(trainer.save_dir)))
    )
    outs = pred([str(root / "val" / "U+3042" / "0.png")])
    assert len(outs) == 1 and "name" in outs[0]
    assert not lora.is_lora_tree(pred.params)

    # standalone validator restores the same checkpoint
    vres = ClassifyValidator(
        load_config(
            overrides=dict(
                task="classify", data=str(root),
                model=str(trainer.save_dir / "weights"), imgsz=32, patch=8,
                dim=32, depth=1, heads=2, workers=0, dtype="float32",
                project=str(tmp_path / "runs"), name="lora-val",
                exist_ok=True,
            )
        )
    ).run()
    assert "acc" in vres


def test_finetune_vlm_native(tmp_path):
    """The P34 entry point end-to-end on the native backend: column_info.csv
    -> LoRA SFT -> a loadable recognize run."""
    import pandas as pd

    from kuzu.tools.vlm_finetune import finetune_vlm

    root = tmp_path / "cols"
    root.mkdir()
    rows = []
    for i in range(12):
        text = TEXTS[i % len(TEXTS)]
        _line_image(text, size=(64, 256)).save(root / f"c{i}.png")
        rows.append(
            {
                "column_image": f"c{i}.png",
                "unicode_ids": " ".join(f"U+{ord(c):04X}" for c in text),
            }
        )
    csv = root / "column_info.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    run_dir, res = finetune_vlm(
        csv, output_dir=tmp_path / "sft", lora_rank=2, max_steps=4,
        backend="native", batch=4, imgsz=[64, 256], patch=16,
        enc_dim=32, enc_depth=1, enc_heads=2, dec_dim=32, dec_depth=1,
        dec_heads=2, max_label_length=8, warmup_epochs=0.0,
        workers=0, dtype="float32",
    )
    assert "fitness" in res
    run_dir = Path(run_dir)
    assert (run_dir / "weights" / "last").exists()
    assert (run_dir / "tokenizer.json").exists()
