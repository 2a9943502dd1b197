"""Solutions layer: counting/heatmap/speed/queue/zone analytics
(reference ``ultralytics/solutions``)."""

import numpy as np
import pytest

from kuzu.api.results import Boxes, Results
from kuzu.solutions import (
    Analytics,
    Heatmap,
    ObjectCounter,
    QueueManager,
    Region,
    RegionCounter,
    SpeedEstimator,
    TrackZone,
    heatmap_accumulate,
)


def _res(centers, ids=None, size=20.0, shape=(200, 200), cls=None):
    c = np.asarray(centers, np.float32).reshape(-1, 2)
    boxes = np.concatenate([c - size / 2, c + size / 2], axis=1)
    n = len(boxes)
    return Results(
        orig_img=None,
        path="synthetic",
        names={0: "char"},
        boxes=Boxes(
            boxes,
            np.full(n, 0.9, np.float32),
            np.zeros(n) if cls is None else np.asarray(cls),
            shape,
            None if ids is None else np.asarray(ids),
        ),
    )


def test_region_contains_square_and_concave():
    sq = Region([(0, 0), (10, 0), (10, 10), (0, 10)])
    pts = np.array([[5, 5], [15, 5], [9.5, 9.5], [-1, 5]])
    np.testing.assert_array_equal(sq.contains(pts), [True, False, True, False])
    # concave L-shape: the notch is outside
    L = Region([(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)])
    np.testing.assert_array_equal(
        L.contains(np.array([[2, 8], [8, 8], [8, 2]])), [True, False, True]
    )


def test_region_counter_counts_per_region():
    rc = RegionCounter(
        {"left": [(0, 0), (100, 0), (100, 200), (0, 200)],
         "right": [(100, 0), (200, 0), (200, 200), (100, 200)]}
    )
    out = rc.update(_res([(50, 50), (60, 120), (150, 50)]))
    assert out == {"left": 2, "right": 1}


def test_object_counter_in_out_line_crossing():
    # vertical counting line at x=100, directed upward: left->right is 'in'
    oc = ObjectCounter(line=((100, 0), (100, 200)))
    tid = [1, 2]
    oc.update(_res([(80, 50), (120, 150)], ids=tid))
    assert (oc.in_count, oc.out_count) == (0, 0)  # first sighting, no cross
    oc.update(_res([(130, 50), (90, 150)], ids=tid))  # 1 crosses ->, 2 <-
    assert oc.in_count == 1 and oc.out_count == 1
    oc.update(_res([(140, 50)], ids=[1]))  # same side, no recount
    assert oc.in_count == 1 and oc.out_count == 1
    with pytest.raises(ValueError, match="track"):
        oc.update(_res([(10, 10)]))


def test_speed_estimator_px_per_frame():
    se = SpeedEstimator(fps=10.0, px_per_unit=2.0)
    se.update(_res([(0, 0)], ids=[7]))
    out = se.update(_res([(6, 8)], ids=[7]))  # moved 10 px in 1 frame
    assert out[7] == pytest.approx(10.0 * 10.0 / 2.0)


def test_queue_manager_persistence():
    qm = QueueManager([(0, 0), (100, 0), (100, 100), (0, 100)], min_frames=2)
    assert qm.update(_res([(50, 50), (150, 50)], ids=[1, 2])) == 0  # 1 frame
    assert qm.update(_res([(55, 50), (150, 50)], ids=[1, 2])) == 1  # streak 2
    assert qm.update(_res([(150, 55)], ids=[1])) == 0  # left the region


def test_trackzone_filters_and_keeps_ids():
    tz = TrackZone([(0, 0), (100, 0), (100, 200), (0, 200)])
    out = tz(_res([(50, 50), (150, 50)], ids=[3, 4]))
    assert len(out.boxes) == 1
    assert out.boxes.id.tolist() == [3]


def test_heatmap_matmul_accumulation_hot_at_box():
    boxes = np.array([[40, 40, 60, 60], [0, 0, 0, 0]], np.float32)
    heat = heatmap_accumulate(boxes, np.array([1.0, 0.0], np.float32), (100, 100))
    assert heat.shape == (100, 100)
    assert heat[50, 50] > 0.9  # peak at the box center
    assert heat[50, 50] > 10 * heat[10, 10]  # cold far away
    assert heat[5, 5] == pytest.approx(0, abs=1e-3)  # padded row contributes 0


def test_heatmap_class_accumulates_and_renders():
    hm = Heatmap((64, 64))
    for cx in (20, 20, 44):
        hm.update(_res([(cx, 32)], size=10, shape=(64, 64)))
    assert hm.heat[32, 20] > hm.heat[32, 44]  # visited twice vs once
    frame = np.zeros((64, 64, 3), np.uint8)
    out = hm.render(frame)
    assert out.shape == frame.shape and out.dtype == np.uint8


def test_analytics_series_and_csv(tmp_path):
    an = Analytics(names={0: "char", 1: "seal"})
    an.update(_res([(10, 10), (20, 20)], cls=[0, 1]))
    an.update(_res([(10, 10)], cls=[0]))
    an.to_csv(tmp_path / "counts.csv")
    lines = (tmp_path / "counts.csv").read_text().splitlines()
    assert lines[0] == "frame,char,seal"
    assert lines[1] == "0,1,1" and lines[2] == "1,1,0"
