"""Dataset viewer web app: live-server pagination + rendering tests
(reference ``dataset_viewer.py:15-179`` parquet browser parity)."""

import json
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest
import yaml
from PIL import Image


@pytest.fixture()
def column_csv(tmp_path):
    (tmp_path / "columns").mkdir()
    rows = []
    for i in range(5):
        Image.new("RGB", (40, 120), (240, 230, 210)).save(
            tmp_path / "columns" / f"c{i}.jpg"
        )
        rows.append(
            {
                "column_image": f"columns/c{i}.jpg",
                "original_image": "page.jpg",
                "box_in_original": "[0, 0, 40, 120]",
                "unicode_ids": "U+3042 U+3044",
            }
        )
    csv = tmp_path / "column_info.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


@pytest.fixture()
def yolo_yaml(tmp_path):
    for sub in ("images/train", "labels/train"):
        (tmp_path / sub).mkdir(parents=True)
    for i in range(3):
        Image.fromarray(
            np.random.default_rng(i).integers(0, 255, (64, 64, 3), np.uint8)
        ).save(tmp_path / "images/train" / f"im{i}.jpg")
        (tmp_path / "labels/train" / f"im{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.4\n"
        )
    spec = tmp_path / "dataset.yaml"
    spec.write_text(
        yaml.safe_dump(
            {"path": ".", "train": "images/train", "val": "images/train",
             "nc": 1, "names": {0: "char"}}
        )
    )
    return spec


def _serve(source):
    from kuzu.serve.viewer import make_viewer_server

    srv = make_viewer_server(source, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, port


def _get(port, path="/"):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read().decode()


def test_viewer_column_info(column_csv):
    srv, port = _serve(column_csv)
    try:
        status, body = _get(port, "/?page=1")
        assert status == 200
        assert "kuzu dataset viewer" in body
        assert body.count("data:image") == 5  # every sample thumbnailed
        assert "あ" in body or "U+3042" in body  # decoded or raw codepoints
    finally:
        srv.shutdown()


def test_viewer_yolo_pagination(yolo_yaml):
    from kuzu.serve.viewer import DatasetBrowser

    srv, port = _serve(yolo_yaml)
    try:
        status, body = _get(port, "/?page=1")
        assert status == 200
        assert body.count("data:image") == 3
        # out-of-range page clamps instead of erroring
        status2, body2 = _get(port, "/?page=99")
        assert status2 == 200
    finally:
        srv.shutdown()
    b = DatasetBrowser(yolo_yaml, per_page=2)
    assert b.total == 3
    p1, p2 = b.render(0), b.render(1)  # render() pages are 0-indexed
    assert p1.count("data:image") == 2 and p2.count("data:image") == 1
    assert b.render(99).count("data:image") == 1  # clamps to the last page


def test_viewer_rejects_unknown_source(tmp_path):
    from kuzu.serve.viewer import DatasetBrowser

    with pytest.raises(ValueError):
        DatasetBrowser(tmp_path / "nope.txt")
