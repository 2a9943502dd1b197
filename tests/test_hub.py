"""Local hub registry + download utilities (reference ``hub/session.py``,
``utils/downloads.py``)."""

import json
import zipfile
from pathlib import Path

import pytest

from kuzu.core.hub import (
    check_file,
    hub_dir,
    list_models,
    publish,
    resolve,
    safe_download,
)


@pytest.fixture()
def hub_env(tmp_path, monkeypatch):
    monkeypatch.setenv("KUZU_HUB_DIR", str(tmp_path / "hub"))
    run = tmp_path / "runs" / "detect" / "toy"
    (run / "ckpt").mkdir(parents=True)
    (run / "ckpt" / "weights.bin").write_bytes(b"\x00" * 128)
    (run / "args.yaml").write_text("task: detect\nmodel: yolov8n\n")
    (run / "results.csv").write_text("epoch,fitness\n0,0.5\n")
    return run


def test_publish_resolve_roundtrip(hub_env):
    dest = publish(hub_env)
    assert dest == hub_dir() / "toy"
    meta = json.loads((dest / "model.json").read_text())
    assert meta["task"] == "detect"
    assert any(k.startswith("ckpt") for k in meta["files"])
    # resolve with checksum verification
    assert resolve("hub://toy", verify=True) == dest
    assert [m["name"] for m in list_models()] == ["toy"]
    # non-hub specs pass through untouched
    assert resolve("runs/x") == Path("runs/x")


def test_resolve_missing_and_corrupt(hub_env):
    with pytest.raises(FileNotFoundError, match="not found"):
        resolve("hub://nope")
    dest = publish(hub_env, "t2")
    (dest / "args.yaml").write_text("tampered: 1\n")
    with pytest.raises(ValueError, match="sha256 mismatch"):
        resolve("hub://t2", verify=True)


def test_model_facade_accepts_hub_spec(hub_env):
    from kuzu.api.model import Model

    publish(hub_env, "det-prod")
    m = Model("hub://det-prod")
    assert m.task == "detect"  # read from the published args.yaml
    assert m.model_spec == str(hub_dir() / "det-prod")


def test_safe_download_file_url_checksum_unzip(tmp_path):
    src = tmp_path / "data.bin"
    src.write_bytes(b"kuzu")
    import hashlib

    good = hashlib.sha256(b"kuzu").hexdigest()
    out = safe_download(f"file://{src}", tmp_path / "out" / "data.bin", sha256=good)
    assert out.read_bytes() == b"kuzu"
    with pytest.raises(ValueError, match="sha256"):
        safe_download(str(src), tmp_path / "bad.bin", sha256="0" * 64)
    z = tmp_path / "arch.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner.txt", "hello")
    ext = safe_download(str(z), tmp_path / "copy.zip", unzip=True)
    assert (ext / "inner.txt").read_text() == "hello"


def test_check_file_paths_and_hub(hub_env, tmp_path):
    f = tmp_path / "exists.txt"
    f.write_text("x")
    assert check_file(f) == f
    publish(hub_env, "cf")
    assert check_file("hub://cf").name == "cf"
    with pytest.raises(FileNotFoundError):
        check_file(tmp_path / "missing.txt")
