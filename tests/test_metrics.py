import numpy as np

from kuzu.core.metrics import (
    DetMetrics,
    character_accuracy,
    character_error_rate,
    compute_ap,
    levenshtein,
    match_predictions,
)


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein([1, 2, 3], [1, 3]) == 1


def test_cer():
    assert character_error_rate(["abc"], ["abc"]) == 0.0
    assert character_error_rate(["axc"], ["abc"]) == 1 / 3


def test_compute_ap_perfect():
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 1.0])
    ap101, _, _ = compute_ap(recall, precision)
    ap11, _, _ = compute_ap(recall, precision, method="interp11")
    assert ap101 > 0.99
    assert ap11 > 0.99


def test_match_predictions_greedy():
    gt = np.array([[0.0, 0, 10, 10]])
    preds = np.array([[0.0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5]])
    correct = match_predictions(
        preds, np.zeros(2), gt, np.zeros(1), np.array([0.5])
    )
    # only one prediction can match the single GT
    assert correct.sum() == 1 and correct[0, 0]


def test_det_metrics_perfect_detector():
    m = DetMetrics()
    gt = np.array([[0.0, 0, 10, 10], [20, 20, 40, 40]], dtype=np.float32)
    m.update(
        pred_boxes=gt,
        pred_scores=np.array([0.9, 0.8]),
        pred_classes=np.array([0, 1]),
        pred_valid=np.array([True, True]),
        gt_boxes=gt,
        gt_classes=np.array([0, 1]),
        gt_valid=np.array([True, True]),
    )
    res = m.compute()
    assert res["map50"] > 0.99
    assert res["map"] > 0.99
    assert 0.0 <= res["fitness"] <= 1.0


def test_det_metrics_false_positive_lowers_map():
    m = DetMetrics()
    gt = np.array([[0.0, 0, 10, 10]], dtype=np.float32)
    preds = np.array([[50.0, 50, 60, 60], [0, 0, 10, 10]], dtype=np.float32)
    m.update(
        preds,
        np.array([0.95, 0.9]),
        np.zeros(2),
        np.array([True, True]),
        gt,
        np.zeros(1),
        np.array([True]),
    )
    res = m.compute()
    assert 0.0 < res["map50"] < 1.0


def test_character_accuracy():
    gt = np.array([[0.0, 0, 10, 10], [20, 0, 30, 10]])
    preds = np.array([[0.0, 0, 10, 10], [20, 0, 30, 10]])
    acc = character_accuracy(preds, np.array([1, 2]), gt, np.array([1, 3]))
    assert acc == 0.5


def test_match_predictions_hungarian_beats_greedy():
    """Constructed case where greedy matching strands a prediction but the
    optimal assignment (use_scipy=True, reference engine/validator.py:222)
    matches both: pred0 overlaps both GTs (best with gt0), pred1 overlaps
    only gt0. Greedy pairs (gt0, pred0) first and leaves pred1 unmatched;
    Hungarian assigns pred0->gt1, pred1->gt0."""
    from kuzu.core.metrics import match_predictions

    gt = np.array([[0.0, 0, 20, 10], [5, 0, 19, 10]])
    preds = np.array([[0.0, 0, 19, 10], [0, 0, 14, 10]])
    classes = np.zeros(2)
    thr = np.array([0.5])
    greedy = match_predictions(preds, classes, gt, classes, thr)
    hung = match_predictions(preds, classes, gt, classes, thr, use_scipy=True)
    assert greedy[:, 0].sum() == 1  # pred1 stranded
    assert hung[:, 0].sum() == 2    # optimal: both matched


def test_det_metrics_custom_iou_matrix_overrides_box_iou():
    """iou_matrix replaces axis-aligned IoU (the OBB probIoU / pose OKS
    hook): disjoint boxes + identity similarity still yields perfect mAP."""
    m = DetMetrics()
    gt = np.array([[0.0, 0, 10, 10], [20, 20, 40, 40]], dtype=np.float32)
    preds = np.array([[100.0, 100, 110, 110], [200, 200, 220, 220]],
                     dtype=np.float32)  # zero box IoU with gt
    m.update(
        preds,
        np.array([0.9, 0.8]),
        np.zeros(2),
        np.array([True, True]),
        gt,
        np.zeros(2),
        np.array([True, True]),
        iou_matrix=np.eye(2, dtype=np.float32),
    )
    res = m.compute()
    assert res["map50"] > 0.99 and res["map"] > 0.99

    # and without the matrix the same inputs score zero
    m2 = DetMetrics()
    m2.update(
        preds, np.array([0.9, 0.8]), np.zeros(2), np.array([True, True]),
        gt, np.zeros(2), np.array([True, True]),
    )
    assert m2.compute()["map50"] == 0.0
