"""The production harness's durable results ledger.

Chain logs and checkpoints live in the untracked ``runs/`` tree, which
dies with the container; every ``kuzu.tools.production`` stage summary
must also land in the git-tracked ``results/production.jsonl`` ledger
(override dir via ``KUZU_RESULTS_DIR``) so measured numbers survive.
"""

import json

import pytest

from kuzu.tools import production as P


def test_stage_summary_appends_to_ledger(tmp_path, monkeypatch):
    monkeypatch.setenv("KUZU_RESULTS_DIR", str(tmp_path))
    monkeypatch.setattr(
        P, "bench", lambda root, **kv: {"pages_per_s": 2.49, "n": 12, "rec": "ctc"}
    )
    P.main(["bench", "root=" + str(tmp_path / "prod")])
    P.main(["bench", "root=" + str(tmp_path / "prod")])

    rows = [
        json.loads(line)
        for line in (tmp_path / "production.jsonl").read_text().splitlines()
    ]
    assert len(rows) == 2
    for row in rows:
        assert row["cmd"] == "bench"
        assert row["pages_per_s"] == 2.49
        assert row["rec"] == "ctc"
        assert "ts" in row


def test_ledger_failure_never_breaks_the_stage(tmp_path, monkeypatch, capsys):
    # Point the ledger dir at a *file* so mkdir/open fails.
    blocker = tmp_path / "blocked"
    blocker.write_text("x")
    monkeypatch.setenv("KUZU_RESULTS_DIR", str(blocker))
    monkeypatch.setattr(P, "bench", lambda root, **kv: {"ok": True})
    P.main(["bench", "root=" + str(tmp_path / "prod")])  # must not raise
    assert "[ledger] skipped" in capsys.readouterr().err


def test_jsonable_handles_nested_and_numpy():
    import numpy as np

    out = P._jsonable(
        {"a": np.float32(1.5), "b": [np.int64(2), "x"], "c": {"d": True, "e": None}}
    )
    assert out == {"a": 1.5, "b": [2.0, "x"], "c": {"d": True, "e": None}}
    json.dumps(out)


def test_greedy_iou_match_known_boxes():
    """VERDICT r4 item 8: pin the real-page matcher on a hand-checked
    fixture (reference matching semantics: engine/validator.py:222)."""
    import numpy as np

    gt = np.array(
        [
            [0, 0, 10, 10],  # matched exactly by pred 0
            [20, 0, 30, 10],  # matched at IoU ~0.68 by pred 1
            [40, 0, 50, 10],  # best IoU ~0.33: counts only at the 0.25 bar
            [60, 0, 70, 10],  # completely missed
        ],
        np.float32,
    )
    pred = np.array(
        [
            [0, 0, 10, 10],
            [22, 0, 30, 10],
            [45, 0, 55, 10],
            [90, 0, 99, 10],  # spurious
        ],
        np.float32,
    )
    matched, used, per_gt = P.greedy_iou_match(gt, pred, (0.5, 0.25))
    assert matched[0.5] == 2 and matched[0.25] == 3
    assert used.tolist() == [True, True, False, False]
    assert per_gt[0] == 1.0 and per_gt[3] == 0.0
    assert 0.6 < per_gt[1] < 0.9 and 0.25 < per_gt[2] < 0.5


def test_greedy_iou_match_one_to_one():
    """Two predictions over one GT: only one may consume it (the greedy
    global-argmax order), the other stays unmatched even above threshold."""
    import numpy as np

    gt = np.array([[0, 0, 10, 10]], np.float32)
    pred = np.array([[0, 0, 10, 10], [1, 0, 11, 10]], np.float32)
    matched, used, per_gt = P.greedy_iou_match(gt, pred, (0.5, 0.25))
    assert matched[0.5] == 1 and matched[0.25] == 1
    assert used.tolist() == [True, False]


def test_greedy_iou_match_empty():
    import numpy as np

    m, used, per_gt = P.greedy_iou_match(
        np.zeros((2, 4), np.float32), np.zeros((0, 4), np.float32)
    )
    assert m[0.5] == 0 and used.size == 0 and per_gt.tolist() == [0.0, 0.0]


def test_wildcard_cer():
    assert P.wildcard_cer("abc", "abc") == 0.0
    assert P.wildcard_cer("a〓c", "axc") == 0.0  # wildcard matches any char
    assert P.wildcard_cer("a〓c", "ac") == pytest.approx(1 / 3)  # still consumes
    assert P.wildcard_cer("abc", "") == 1.0
    assert P.wildcard_cer("", "xy") == 2.0  # empty ref: insertions / max(g,1)
    assert P.wildcard_cer("ab", "cb") == 0.5


def test_char_level_eval_mocked_pipeline():
    """VERDICT r4 item 3 plumbing: char GT scoring against a fake cascade
    result built FROM the GT (perfect boxes + text => recall 1, CER 0)."""
    import numpy as np

    cg = json.loads(P.CHAR_GT.read_text())
    boxes, pred, pb = [], [], []
    for spec in cg["columns"].values():
        boxes += [g["box"] for g in spec["glyphs"]]
        text = "".join(
            g["text"] if g["conf"] != "low" else "x" for g in spec["glyphs"]
        )
        pred.append({"box": spec["box"], "text": text})
        pb.append(spec["box"])
    res = {"characters": {"boxes": np.asarray(boxes, np.float32)}}
    out = P._char_level_eval(res, pred, np.asarray(pb, np.float32))
    assert out["overall"]["char_recall@0.5"] == 1.0
    assert out["overall"]["char_precision@0.5"] == 1.0
    assert out["overall"]["cer_wildcard"] == 0.0  # low-conf = wildcard
    assert out["c2"]["gt_glyphs"] == 14 and out["c3"]["gt_glyphs"] == 12

    # jittered boxes (+30 px shrink) drop IoU below 0.5 but stay over 0.25
    jit = np.asarray(boxes, np.float32)
    jit[:, 0] += 30
    res2 = {"characters": {"boxes": jit}}
    out2 = P._char_level_eval(res2, pred, np.asarray(pb, np.float32))
    assert out2["overall"]["char_recall@0.25"] >= out2["overall"]["char_recall@0.5"]

    # empty prediction: recall 0, CER 1
    res3 = {"characters": {"boxes": np.zeros((0, 4), np.float32)}}
    out3 = P._char_level_eval(res3, [], np.zeros((0, 4), np.float32))
    assert out3["overall"]["char_recall@0.5"] == 0.0
    assert out3["overall"]["cer_wildcard"] == 1.0
