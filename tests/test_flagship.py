"""Flagship harness: synthetic page set + x-scale P2-P5 spec sanity.

The flagship configuration is the reference's production character detector
(yolov12x with the P2-P5 head, `yolov12/ultralytics/cfg/models/v12/
yolov12x.yaml:29-55`); the on-chip step-time/MFU/convergence runs live in
PERFORMANCE.md — these tests keep the harness itself honest on the CPU mesh.
"""

import numpy as np
import yaml


def test_synth_pages_layout(tmp_path):
    from kuzu.tools.flagship import synth_pages

    yml = synth_pages(tmp_path, n_train=3, n_val=2, imgsz=320, nc=5, seed=1)
    spec = yaml.safe_load(yml.read_text())
    assert spec["nc"] == 5 and len(spec["names"]) == 5
    for split, n in (("train", 3), ("val", 2)):
        imgs = sorted((tmp_path / "images" / split).glob("*.jpg"))
        assert len(imgs) == n
        for img in imgs:
            rows = (
                (tmp_path / "labels" / split / f"{img.stem}.txt")
                .read_text()
                .strip()
                .splitlines()
            )
            assert len(rows) >= 10  # dense, multi-column pages
            arr = np.array([[float(v) for v in r.split()] for r in rows])
            assert arr[:, 0].max() < 5  # class ids within nc
            # yolo xywh all inside the unit square
            assert (arr[:, 1:] > 0).all() and (arr[:, 1:] < 1).all()
            x1 = arr[:, 1] - arr[:, 3] / 2
            x2 = arr[:, 1] + arr[:, 3] / 2
            assert (x1 >= 0).all() and (x2 <= 1).all()
            # multi-class on every page
            assert len(np.unique(arr[:, 0])) >= 2


def test_p2x_spec_strides_and_width():
    """yolov12-p2x parses to the flagship graph: P2-P5 strides, x-scale
    widths (1.5x, max 512), C3k enabled at x scale."""
    from kuzu.models.yolo.detector import YoloDetector

    det = YoloDetector("yolov12-p2x", nc=1, imgsz=640)
    assert det.strides == [4, 8, 16, 32]
    assert det.spec.detect_ch == [192, 384, 768, 768]
    c3k2 = [n for n in det.spec.nodes if n.module == "C3k2"]
    assert all(n.args[1] for n in c3k2)  # c3k=True at x scale
    # anchor budget at 640: 160^2 + 80^2 + 40^2 + 20^2
    from kuzu.ops.anchors import make_anchors

    pts, strides = make_anchors(det.feat_shapes(640), det.strides)
    assert pts.shape[0] == 160**2 + 80**2 + 40**2 + 20**2 == 34000
