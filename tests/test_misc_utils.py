"""Settings, itaiji normalization, split-arrange resize, VLM gating."""

import numpy as np
import pytest


def test_settings_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("KUZU_CONFIG_DIR", str(tmp_path))
    from kuzu.core.settings import Settings

    s = Settings()
    assert s["runs_dir"] == "runs"
    s.update_and_save(runs_dir="exp")
    s2 = Settings()
    assert s2["runs_dir"] == "exp"
    with pytest.raises(KeyError):
        s2.update_and_save(nope=1)
    s2.reset()
    assert Settings()["runs_dir"] == "runs"


def test_itaiji_normalizer():
    from kuzu.tools.kanji import ItaijiNormalizer, build_map_from_pairs

    n = ItaijiNormalizer()
    assert n.normalize("學問の國") == "学問の国"
    assert n.normalize("ひらがな") == "ひらがな"  # untouched
    m = build_map_from_pairs([("甲", "乙"), ("乙", "丙")])
    assert m["甲"] == "丙"  # chain resolution
    with pytest.raises(ValueError):
        build_map_from_pairs([("甲", "乙"), ("甲", "丙")])


def test_split_and_arrange():
    from kuzu.tools.image_resize import (
        process_column_for_square_input,
        resize_preserve_aspect,
        split_and_arrange,
    )

    # tall column: 3 segments of 384 at width 64
    img = np.zeros((1000, 128, 3), np.uint8)
    img[500:510] = 200  # a marker band
    resized = resize_preserve_aspect(img, 64)
    assert resized.shape[1] == 64
    assert abs(resized.shape[0] - 500) <= 1
    canvas = split_and_arrange(resized, segment_height=384)
    assert canvas.shape == (384, 384, 3)
    # segments rotated: content occupies rows [0, 64), [64, 128) for seg 0/1
    assert canvas[:64].min() == 0  # first segment content present
    out = process_column_for_square_input(img, 64, 384)
    assert out.shape == (384, 384, 3)


def test_vlm_finetune_gated(tmp_path):
    import json

    import pandas as pd

    from kuzu.tools.vlm_finetune import build_sft_records, finetune_vlm

    csv = tmp_path / "column_info.csv"
    pd.DataFrame(
        [{"column_image": "c.jpg", "unicode_ids": "U+3042 U+3044"}]
    ).to_csv(csv, index=False)
    recs = build_sft_records(csv)
    assert recs[0]["messages"][1]["content"] == "あい"
    # the reference's unsloth/TRL path stays gated in this image; the
    # native LoRA path is exercised end-to-end in tests/test_lora.py
    with pytest.raises(ImportError, match="native"):
        finetune_vlm(csv, backend="unsloth")


def test_autobackend_run_dir_detection(tmp_path):
    from kuzu.api.backend import AutoBackend

    with pytest.raises(ValueError, match="cannot identify"):
        AutoBackend(tmp_path / "nothing.xyz")
