"""P38 offline housekeeping utilities (``kuzu.tools.dataset_utils``)."""

import json

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def book_tree(tmp_path):
    for book, n in (("bookA", 3), ("bookB", 1)):
        d = tmp_path / "dataset" / book
        d.mkdir(parents=True)
        for i in range(n):
            Image.new("RGB", (8, 8)).save(d / f"p{i}.jpg")
    return tmp_path


def test_count_pages(book_tree):
    from kuzu.tools.dataset_utils import count_pages

    out = count_pages(book_tree / "dataset")
    assert out == [("bookB", 1), ("bookA", 3)]  # ascending


def test_check_images_finds_corrupt(book_tree):
    from kuzu.tools.dataset_utils import check_images

    bad = book_tree / "dataset" / "bookA" / "broken.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nnot really a png")
    found = check_images(book_tree / "dataset", workers=2)
    assert [str(bad)] == found


def test_move_hyphen_images(book_tree):
    from kuzu.tools.dataset_utils import move_hyphen_images

    f = book_tree / "dataset" / "bookA" / "img-001.jpg"
    Image.new("RGB", (8, 8)).save(f)
    moves = move_hyphen_images(book_tree, dry_run=True)
    assert len(moves) == 1 and f.exists()
    moves = move_hyphen_images(book_tree)
    assert not f.exists()
    assert (book_tree / "error" / "bookA" / "img-001.jpg").exists()


@pytest.fixture()
def column_csv(tmp_path):
    rows = [
        "column_image,original_image,char_boxes_in_column,unicode_ids",
        'cols/bk1/c0.png,p0.jpg,"[[1, 2, 3, 4], [5, 6, 7, 8]]",U+3042 U+3044',
        "cols/bk1/c1.png,p0.jpg,,U+3046",
        "cols/bk2/c0.png,p1.jpg,\"[[0, 0, 2, 2]]\",\"['U+4E00', 'U+4E8C']\"",
    ]
    p = tmp_path / "column_info.csv"
    p.write_text("\n".join(rows), encoding="utf-8")
    return p


def test_split_annotation(column_csv, tmp_path):
    from kuzu.tools.dataset_utils import split_annotation

    counts = split_annotation(column_csv, tmp_path / "books")
    assert counts == {"bk1": 2, "bk2": 1}
    lines = (tmp_path / "books" / "bk1.csv").read_text().splitlines()
    assert lines[0].startswith("column_image") and len(lines) == 3


def test_char_dict_sorted_and_both_formats(column_csv, tmp_path):
    from kuzu.tools.dataset_utils import char_dict

    out = tmp_path / "chars.json"
    mapping = char_dict(column_csv, out)
    # あ(3042) い(3044) う(3046) 一(4E00) 二(4E8C), codepoint order
    assert list(mapping) == ["U+3042", "U+3044", "U+3046", "U+4E00", "U+4E8C"]
    assert json.loads(out.read_text())["U+4E8C"] == 4


def test_create_labels_and_bboxes(column_csv, tmp_path):
    from kuzu.tools.dataset_utils import create_bboxes, create_labels

    n = create_labels(column_csv, tmp_path / "labels")
    assert n == 3
    assert (tmp_path / "labels" / "bk1" / "c0.txt").read_text() == "あい"
    assert (tmp_path / "labels" / "bk2" / "c0.txt").read_text() == "一二"
    n = create_bboxes(column_csv, tmp_path / "bboxes")
    assert n == 2  # the empty cell row is skipped
    boxes = json.loads((tmp_path / "bboxes" / "bk1" / "c0.json").read_text())
    assert boxes == [[1, 2, 3, 4], [5, 6, 7, 8]]


def test_count_yolo(tmp_path):
    import yaml

    from kuzu.tools.dataset_utils import count_yolo

    for split, n in (("train", 2), ("val", 1)):
        (tmp_path / "images" / split).mkdir(parents=True)
        (tmp_path / "labels" / split).mkdir(parents=True)
        for i in range(n):
            Image.new("RGB", (8, 8)).save(tmp_path / "images" / split / f"{i}.jpg")
            (tmp_path / "labels" / split / f"{i}.txt").write_text(
                "0 0.5 0.5 0.1 0.1\n0 0.2 0.2 0.1 0.1"
            )
    y = tmp_path / "dataset.yaml"
    y.write_text(yaml.safe_dump(
        {"path": ".", "train": "images/train", "val": "images/val", "nc": 1}
    ))
    out = count_yolo(y)
    assert out["train"] == {"images": 2, "labels": 2, "instances": 4}
    assert out["val"]["instances"] == 2
