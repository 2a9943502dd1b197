import numpy as np
import yaml
from PIL import Image

from kuzu.data.tokenizer import BigramTokenizer, CharTokenizer
from kuzu.tools.analysis import (
    analyze_bbox_sizes,
    analyze_text_lengths,
    auto_batch_size,
    char_counts,
    split_by_threshold,
    yolo_to_coco,
)


def _tiny_yolo(tmp_path):
    for split in ("train",):
        (tmp_path / "images" / split).mkdir(parents=True)
        (tmp_path / "labels" / split).mkdir(parents=True)
    Image.new("RGB", (100, 200), (230,) * 3).save(tmp_path / "images/train/a.jpg")
    (tmp_path / "labels/train/a.txt").write_text("0 0.5 0.5 0.2 0.1\n1 0.25 0.25 0.1 0.1")
    yml = tmp_path / "dataset.yaml"
    yml.write_text(yaml.safe_dump({"path": ".", "train": "images/train", "val": "images/train", "names": {0: "a", 1: "b"}, "nc": 2}))
    return yml


def test_analyze_bbox_sizes(tmp_path):
    yml = _tiny_yolo(tmp_path)
    stats = analyze_bbox_sizes(yml)
    assert stats["n_images"] == 1 and stats["n_boxes"] == 2
    np.testing.assert_allclose(stats["width"]["mean"], (20 + 10) / 2, rtol=1e-5)


def test_yolo_to_coco(tmp_path):
    yml = _tiny_yolo(tmp_path)
    coco = yolo_to_coco(yml, out_path=tmp_path / "coco.json")
    assert len(coco["images"]) == 1
    assert len(coco["annotations"]) == 2
    ann = coco["annotations"][0]
    np.testing.assert_allclose(ann["bbox"], [40, 90, 20, 20])  # xywh pixels
    assert (tmp_path / "coco.json").exists()


def test_text_and_char_analysis():
    texts = ["abc", "ab", "a"]
    tl = analyze_text_lengths(texts)
    assert tl["n"] == 3 and tl["max"] == 3
    cc = char_counts(texts)
    assert cc["a"] == 3 and cc["c"] == 1
    above, below = split_by_threshold(cc, 2)
    assert "a" in above and "c" in below


def test_auto_batch_size():
    b = auto_batch_size(bytes_per_sample=1e6, device_memory_bytes=1e9, memory_fraction=0.5)
    assert b == 256  # 512e6 budget / 1e6 -> 512, but power of two <= 500 -> 256
    assert auto_batch_size(1e12, device_memory_bytes=1e9) == 1


def test_bigram_tokenizer_roundtrip():
    texts = ["ありがとう", "ありえない", "とうきょう"]
    tok = BigramTokenizer.train(texts, min_freq=2)
    # 'あり' and 'とう' appear twice -> bigram tokens exist
    assert "あり" in tok.vocab and "とう" in tok.vocab
    ids = tok.encode("ありがとう", max_length=16)
    # bigram encoding is shorter than char encoding
    char_tok = CharTokenizer.train(texts)
    char_ids = char_tok.encode("ありがとう", max_length=16)
    n_real = (ids != tok.pad_id).sum()
    n_char = (char_ids != char_tok.pad_id).sum()
    assert n_real < n_char
    assert tok.decode(ids) == "ありがとう"
