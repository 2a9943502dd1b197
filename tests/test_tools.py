"""ETL tool tests: DBSCAN column clustering, YOLO prep, padding, stats."""

import json

import numpy as np
import pandas as pd
import pytest
from PIL import Image


def _page_chars():
    """Two clear vertical columns of 4 chars each."""
    boxes = []
    unis = []
    for col_x, codes in ((300, ["U+3042"] * 4), (100, ["U+3044"] * 4)):
        for i in range(4):
            y = 50 + i * 60
            boxes.append([col_x, y, col_x + 40, y + 50])
            unis.append(codes[i])
    return np.asarray(boxes, float), unis


def test_cluster_columns_two_columns():
    from kuzu.tools.preprocess import best_column_clustering

    boxes, _ = _page_chars()
    cols = best_column_clustering(boxes)
    assert len(cols) == 2
    # left column first, chars top-to-bottom
    assert boxes[cols[0][0], 0] == 100
    ys = boxes[cols[0], 1]
    assert (np.diff(ys) > 0).all()


def test_merge_overlapping_columns():
    from kuzu.tools.preprocess import merge_overlapping_columns

    groups = merge_overlapping_columns(
        [(0, 0, 50, 300), (10, 310, 55, 600), (200, 0, 250, 300)]
    )
    sizes = sorted(len(g) for g in groups)
    assert sizes == [1, 2]


def test_preprocess_dataset_end_to_end(tmp_path):
    from kuzu.tools.preprocess import preprocess_dataset

    boxes, unis = _page_chars()
    img_dir = tmp_path / "pages"
    img_dir.mkdir()
    Image.new("RGB", (400, 400), (240, 230, 210)).save(img_dir / "page1.jpg")
    df = pd.DataFrame(
        {
            "Image": ["page1"] * len(boxes),
            "X": boxes[:, 0],
            "Y": boxes[:, 1],
            "Width": boxes[:, 2] - boxes[:, 0],
            "Height": boxes[:, 3] - boxes[:, 1],
            "Unicode": unis,
        }
    )
    csv = tmp_path / "chars.csv"
    df.to_csv(csv, index=False)
    out_csv = preprocess_dataset(csv, img_dir, tmp_path / "out", workers=1)
    rows = pd.read_csv(out_csv)
    assert len(rows) == 2
    assert set(rows.columns) >= {
        "column_image", "original_image", "box_in_original",
        "char_boxes_in_column", "unicode_ids",
    }
    # crops exist; char boxes are in-crop coordinates
    for _, r in rows.iterrows():
        assert (tmp_path / "out" / r["column_image"]).exists()
        cb = np.asarray(json.loads(r["char_boxes_in_column"]))
        assert (cb >= 0).all()
    # unicode ids round-trip
    assert "U+3044" in rows.iloc[0]["unicode_ids"]


def test_yolo_prep_split_by_doc(tmp_path):
    from kuzu.tools.yolo_prep import build_detection_dataset

    img_dir = tmp_path / "pages"
    img_dir.mkdir()
    pages = {}
    rng = np.random.default_rng(0)
    for doc in ("bookA", "bookB", "bookC", "bookD"):
        for p in range(2):
            name = f"{doc}_{p:03d}"
            Image.new("RGB", (200, 200), (230,) * 3).save(img_dir / f"{name}.jpg")
            boxes = rng.uniform(10, 150, (3, 2))
            boxes = np.concatenate([boxes, boxes + 30], 1)
            pages[name] = (boxes, np.zeros(3, int))
    yml = build_detection_dataset(
        pages, img_dir, tmp_path / "ds", names=["column"], seed=0
    )
    assert yml.exists()
    import yaml

    spec = yaml.safe_load(yml.read_text())
    assert spec["nc"] == 1
    # same doc never spans splits
    seen = {}
    for split in ("train", "val", "test"):
        for p in (tmp_path / "ds" / "images" / split).glob("*.jpg"):
            doc = p.stem.split("_")[0]
            assert seen.setdefault(doc, split) == split
    # labels normalized to [0,1]
    some_label = next((tmp_path / "ds" / "labels" / "train").glob("*.txt"))
    vals = [float(v) for line in some_label.read_text().splitlines() for v in line.split()[1:]]
    assert all(0 <= v <= 1 for v in vals)


def test_build_tiled_dataset(tmp_path):
    from kuzu.tools.yolo_prep import build_tiled_dataset, write_dataset_yaml

    src = tmp_path / "src"
    for split in ("train", "val"):
        (src / "images" / split).mkdir(parents=True)
        (src / "labels" / split).mkdir(parents=True)
    Image.new("RGB", (100, 100), (240,) * 3).save(src / "images" / "train" / "a.jpg")
    (src / "labels" / "train" / "a.txt").write_text("0 0.25 0.25 0.2 0.2")
    Image.new("RGB", (100, 100), (240,) * 3).save(src / "images" / "val" / "b.jpg")
    (src / "labels" / "val" / "b.txt").write_text("0 0.5 0.5 0.1 0.1")
    yml = write_dataset_yaml(src, ["c"])
    out = build_tiled_dataset(yml, tmp_path / "tiled", grid=2)
    tiles = list((tmp_path / "tiled" / "images" / "train").glob("*.jpg"))
    assert len(tiles) == 4
    # the box at (0.25, 0.25) is fully contained in the top-left tile only
    labels = {
        p.name: p.read_text().strip()
        for p in (tmp_path / "tiled" / "labels" / "train").glob("*.txt")
    }
    non_empty = [k for k, v in labels.items() if v]
    assert len(non_empty) == 1 and "_0" in non_empty[0]


def test_pad_and_stats(tmp_path):
    from kuzu.tools.image_tools import dataset_mean_std, pad_dataset, pad_to_width

    # dark glyph on light paper
    img = np.full((60, 30, 3), 230, np.uint8)
    img[20:40, 10:20] = 20
    out = pad_to_width(img, 50)
    assert out.shape == (60, 50, 3)
    # padding color close to paper, not glyph
    assert out[:, 0].mean() > 180

    d = tmp_path / "imgs"
    d.mkdir()
    Image.fromarray(img).save(d / "a.png")
    pad_dataset(d, tmp_path / "padded", target_w=50, workers=1)
    assert (tmp_path / "padded" / "a.png").exists()

    mean, std = dataset_mean_std(d)
    assert mean.shape == (3,)
    assert 0.5 < mean[0] < 1.0
    assert (std > 0).all()
