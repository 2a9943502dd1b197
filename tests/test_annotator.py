"""Annotation editor: live-server API tests (save/merge/split/undo)."""

import json
import threading
import urllib.request

import pandas as pd
import pytest
from PIL import Image


@pytest.fixture()
def store_csv(tmp_path):
    (tmp_path / "columns").mkdir()
    rows = []
    for i, text in enumerate(["U+3042 U+3044", "U+3046 U+3048", "U+304A"]):
        img = Image.new("RGB", (40, 120), (250,) * 3)
        img.save(tmp_path / "columns" / f"c{i}.jpg")
        n = len(text.split())
        boxes = [[4, 10 + j * 40, 36, 40 + j * 40] for j in range(n)]
        rows.append(
            {
                "column_image": f"columns/c{i}.jpg",
                "original_image": "page.jpg",
                "box_in_original": "[0, 0, 40, 120]",
                "char_boxes_in_column": json.dumps(boxes),
                "unicode_ids": text,
            }
        )
    csv = tmp_path / "column_info.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


@pytest.fixture()
def server(store_csv):
    from kuzu.serve.annotator import make_annotator_server

    srv, store = make_annotator_server(store_csv, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield {"port": port, "csv": store_csv}
    srv.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.loads(r.read())


def _post(port, path, data):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(data).encode()
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_browse_and_row(server):
    port = server["port"]
    rows = _get(port, "/rows?page=0")
    assert rows["total"] == 3
    r0 = _get(port, "/row/0")
    assert len(r0["boxes"]) == 2
    assert r0["image_b64"]
    assert r0["unicode_ids"] == "U+3042 U+3044"


def test_save_edit_and_undo(server):
    port = server["port"]
    _post(port, "/row/0", {
        "char_boxes_in_column": [[1, 1, 30, 30]],
        "unicode_ids": "U+3042",
    })
    df = pd.read_csv(server["csv"])
    assert json.loads(df.iloc[0]["char_boxes_in_column"]) == [[1, 1, 30, 30]]
    out = _post(port, "/undo", {})
    assert out["status"] == "undone"
    df = pd.read_csv(server["csv"])
    assert len(json.loads(df.iloc[0]["char_boxes_in_column"])) == 2


def test_merge_and_split(server):
    port = server["port"]
    _post(port, "/merge", {"a": 0, "b": 1})
    df = pd.read_csv(server["csv"])
    assert len(df) == 2
    assert df.iloc[0]["unicode_ids"] == "U+3042 U+3044 U+3046 U+3048"
    assert len(json.loads(df.iloc[0]["char_boxes_in_column"])) == 4
    _post(port, "/split", {"row": 0, "at": 2})
    df = pd.read_csv(server["csv"])
    assert len(df) == 3
    assert df.iloc[0]["unicode_ids"] == "U+3042 U+3044"
    assert df.iloc[2]["unicode_ids"] == "U+3046 U+3048"


def test_bad_requests(server):
    port = server["port"]
    try:
        _get(port, "/row/99")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
    try:
        _post(port, "/merge", {"a": 0})
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_editor_page(server):
    port = server["port"]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        body = r.read().decode()
    assert "kuzu annotator" in body and "canvas" in body


def test_move_char_between_rows(store_csv):
    """Cross-column character move (Tk editor parity)."""
    from kuzu.serve.annotator import AnnotationStore

    store = AnnotationStore(store_csv)
    n0 = store.n_chars(0)
    n1 = store.n_chars(1)
    import json as _json

    first_box = _json.loads(store.df.at[0, "char_boxes_in_column"])[0]
    store.move_char(0, 0, 1)
    assert store.n_chars(0) == n0 - 1
    assert store.n_chars(1) == n1 + 1
    moved = _json.loads(store.df.at[1, "char_boxes_in_column"])[-1]
    assert moved == first_box
    # undo restores
    assert store.undo()
    assert store.n_chars(0) == n0


def test_move_endpoint_http(server):
    port = server["port"]
    before = _get(port, "/rows?page=0")["rows"]
    assert "n_chars" in before[0]
    out = _post(port, "/move", {"src": 0, "char": 0, "dst": 1})
    assert out["status"] == "moved"
    after = _get(port, "/rows?page=0")["rows"]
    assert after[1]["n_chars"] == before[1]["n_chars"] + 1
    assert after[0]["n_chars"] == before[0]["n_chars"] - 1
