"""The production harness's durable results ledger.

Chain logs and checkpoints live in the untracked ``runs/`` tree, which
dies with the container; every ``kuzu.tools.production`` stage summary
must also land in the git-tracked ``results/production.jsonl`` ledger
(override dir via ``KUZU_RESULTS_DIR``) so measured numbers survive.
"""

import json

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
