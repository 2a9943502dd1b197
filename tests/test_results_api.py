import json

import numpy as np

from kuzu.api.results import Boxes, Results


def _results():
    boxes = Boxes(
        np.array([[10.0, 20, 50, 80], [100, 100, 150, 180]]),
        np.array([0.9, 0.4]),
        np.array([0, 1]),
        orig_shape=(200, 200),
    )
    return Results(None, "img.jpg", {0: "col", 1: "char"}, boxes)


def test_box_views():
    r = _results()
    np.testing.assert_allclose(r.boxes.xywh[0], [30, 50, 40, 60])
    np.testing.assert_allclose(r.boxes.xyxyn[0], [0.05, 0.1, 0.25, 0.4])
    assert len(r) == 2


def test_dict_compat_and_filter():
    r = _results()
    assert r["boxes"].shape == (2, 4)
    assert r["path"] == "img.jpg"
    f = r.filter(min_conf=0.5)
    assert len(f) == 1 and f.boxes.cls[0] == 0
    f2 = r.filter(classes=[1])
    assert len(f2) == 1 and f2.boxes.cls[0] == 1


def test_json_txt_plot(tmp_path):
    r = _results()
    data = json.loads(r.to_json())
    assert data[0]["name"] == "col" and data[0]["confidence"] == 0.9
    p = r.save_txt(tmp_path / "out.txt")
    lines = p.read_text().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("0 ")
    assert len(lines[0].split()) == 6  # cls + 4 + conf
    img = r.plot()
    assert img.shape == (200, 200, 3)
    # boxes drawn: not all white
    assert (img < 250).any()
    out = r.save(tmp_path / "vis.png")
    assert out.exists()


def test_iteration():
    r = _results()
    singles = list(r)
    assert len(singles) == 2
    assert len(singles[0]) == 1
