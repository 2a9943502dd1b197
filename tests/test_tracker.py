import numpy as np

from kuzu.pipeline.tracker import ByteTracker, KalmanFilterCXCYAH, xyxy_to_cxcyah


def test_kalman_tracks_constant_velocity():
    kf = KalmanFilterCXCYAH()
    mean, cov = kf.initiate(np.array([10.0, 10, 1.0, 20]))
    for t in range(1, 6):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, np.array([10.0 + 5 * t, 10, 1.0, 20]))
    # velocity estimate approaches 5 px/frame
    assert 3.0 < mean[4] < 6.0


def test_bytetracker_consistent_ids():
    tr = ByteTracker(new_track_thresh=0.5)
    ids_seen = []
    for t in range(10):
        boxes = np.array(
            [[10 + 4 * t, 10, 40 + 4 * t, 50], [200, 200 + 3 * t, 240, 260 + 3 * t]],
            np.float32,
        )
        scores = np.array([0.9, 0.8])
        classes = np.array([0, 1])
        tracks = tr.update(boxes, scores, classes)
        assert len(tracks) == 2
        ids_seen.append(sorted(t.track_id for t in tracks))
    # identities stable across all frames
    assert all(ids == ids_seen[0] for ids in ids_seen)


def test_bytetracker_low_conf_rescue():
    tr = ByteTracker(track_high_thresh=0.5, track_low_thresh=0.1)
    box = np.array([[50.0, 50, 100, 120]], np.float32)
    tr.update(box, np.array([0.9]), np.array([0]))
    # next frame the same object drops to low confidence: BYTE keeps the id
    tracks = tr.update(box + 2, np.array([0.3]), np.array([0]))
    assert len(tracks) == 1
    assert tracks[0].track_id == 1


def test_bytetracker_lost_and_removed():
    tr = ByteTracker(track_buffer=2, new_track_thresh=0.5)
    box = np.array([[50.0, 50, 100, 120]], np.float32)
    tr.update(box, np.array([0.9]), np.array([0]))
    empty = np.zeros((0, 4), np.float32)
    for _ in range(3):  # > buffer
        tracks = tr.update(empty, np.zeros(0), np.zeros(0, int))
    assert len(tr.tracks) == 0
    # re-detection gets a NEW id
    tracks = tr.update(box, np.array([0.9]), np.array([0]))
    assert tracks[0].track_id == 2


def test_gmc_estimates_translation():
    import cv2

    from kuzu.pipeline.tracker import GMC

    rng = np.random.default_rng(0)
    base = (rng.uniform(0, 255, (120, 160)) > 250).astype(np.uint8) * 255
    base = cv2.dilate(base, np.ones((3, 3), np.uint8))
    f1 = np.stack([base] * 3, -1)
    f2 = np.roll(f1, (5, 9), axis=(0, 1))  # camera shifted by (9, 5)
    g = GMC()
    g.update(f1)
    M = g.update(f2)
    assert abs(M[0, 2] - 9) < 2 and abs(M[1, 2] - 5) < 2
    box = np.array([10.0, 10, 30, 30])
    warped = GMC.warp_box(box, M)
    assert abs(warped[0] - 19) < 2 and abs(warped[1] - 15) < 2


def test_botsort_survives_camera_shift():
    import cv2

    from kuzu.pipeline.tracker import BoTSORT

    rng = np.random.default_rng(1)
    texture = (rng.uniform(0, 255, (200, 200)) > 248).astype(np.uint8) * 255
    texture = cv2.dilate(texture, np.ones((3, 3), np.uint8))
    tr = BoTSORT(new_track_thresh=0.5)
    obj = np.array([[80.0, 80, 120, 130]], np.float32)
    ids = []
    shift = 0
    for f in range(6):
        shift = f * 12  # fast pan: object appears shifted each frame
        frame = np.stack([np.roll(texture, shift, axis=1)] * 3, -1)
        boxes = obj + [shift, 0, shift, 0]
        tracks = tr.update(boxes, np.array([0.9]), np.array([0]), frame=frame)
        assert len(tracks) == 1
        ids.append(tracks[0].track_id)
    assert len(set(ids)) == 1, f"identity lost under camera motion: {ids}"


def test_model_track_facade(tmp_path):
    """Model.track wires predict -> tracker -> Results.boxes.id
    (reference engine/model.py:562)."""
    import numpy as np

    from kuzu.api.model import Model, register_task
    from kuzu.api.results import Boxes, Results

    class _StubPredictor:
        """Two frames of one box drifting right."""

        def __init__(self, cfg):
            self.cfg = cfg
            self.n = 0

        def __call__(self, source):
            results = []
            for _ in list(source):
                x = 10.0 + 3 * self.n
                self.n += 1
                results.append(
                    Results(
                        orig_img=None, path="", names={},
                        boxes=Boxes(
                            np.array([[x, 10, x + 20, 40]]),
                            np.array([0.9]), np.array([0]), (64, 64),
                        ),
                    )
                )
            return results

    register_task("_stub_track", predictor=_StubPredictor)
    m = Model("anything", task="_stub_track")
    out = m.track(["f0", "f1", "f2"], tracker="bytetrack")
    assert len(out) == 3
    ids = [r.boxes.id.tolist() for r in out]
    assert ids[0] == ids[1] == ids[2]  # one stable identity across frames


def test_model_tune_facade(tmp_path):
    """Model.tune runs the evolution loop and writes tune_results.csv
    (reference engine/model.py:817)."""
    from kuzu.api.model import Model, register_task

    calls = []

    class _StubTrainer:
        def __init__(self, cfg):
            self.cfg = cfg

        def train(self):
            lr = float(self.cfg.get("lr0", 0.01))
            calls.append(lr)
            return {"fitness": 1.0 - abs(lr - 0.02)}

    register_task("_stub_tune", trainer=_StubTrainer)
    m = Model("anything", task="_stub_tune")
    res = m.tune(iterations=4, tune_dir=str(tmp_path / "tune"), epochs=1)
    assert len(calls) == 4
    assert "best_fitness" in res
    assert (tmp_path / "tune" / "tune_results.csv").exists()
    assert (tmp_path / "tune" / "best_hyps.yaml").exists()
