"""Serve app + export + C++ client end-to-end (trains a tiny detector once)."""

import json
import socket
import subprocess
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """Tiny trained detect run dir shared across serve/export tests."""
    root = tmp_path_factory.mktemp("srv")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(8):
            img = Image.new("RGB", (96, 96), (240, 240, 235))
            d = ImageDraw.Draw(img)
            w, h = int(rng.integers(20, 40)), int(rng.integers(20, 40))
            x, y = int(rng.integers(0, 96 - w)), int(rng.integers(0, 96 - h))
            d.rectangle([x, y, x + w, y + h], fill=(200, 30, 30))
            img.save(root / "images" / split / f"{i}.jpg")
            (root / "labels" / split / f"{i}.txt").write_text(
                f"0 {(x + w / 2) / 96:.4f} {(y + h / 2) / 96:.4f} {w / 96:.4f} {h / 96:.4f}"
            )
    (root / "dataset.yaml").write_text(
        yaml.safe_dump(
            {"path": ".", "train": "images/train", "val": "images/val",
             "names": {0: "box"}, "nc": 1}
        )
    )
    from kuzu.core.config import load_config
    from kuzu.tasks.detect import DetectTrainer

    cfg = load_config(
        overrides=dict(
            task="detect", model="yolov12n", data=str(root / "dataset.yaml"),
            epochs=1, batch=4, imgsz=64, max_boxes=10, workers=0,
            dtype="float32", close_mosaic=0, mosaic=0.0,
            project=str(root / "runs"), name="srv", exist_ok=True,
            val_batches=1, optimizer="adamw", warmup_epochs=0.0,
        )
    )
    trainer = DetectTrainer(cfg)
    trainer.train()
    return {"run_dir": trainer.save_dir, "image": root / "images" / "val" / "0.jpg"}


@pytest.fixture(scope="module")
def server(trained_run):
    from kuzu.serve.app import make_server

    srv = make_server(str(trained_run["run_dir"]), port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield {"port": port, **trained_run}
    srv.shutdown()


def test_health_and_index(server):
    port = server["port"]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        assert b"kuzu" in r.read()


def test_predict_json(server):
    port = server["port"]
    body = Path(server["image"]).read_bytes()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict?conf=0.001",
        data=body,
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert "boxes" in out and "scores" in out and "classes" in out
    assert len(out["boxes"]) == len(out["scores"])


def test_predict_region(server):
    port = server["port"]
    body = Path(server["image"]).read_bytes()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict-region?conf=0.001&x1=10&y1=10&x2=90&y2=90",
        data=body,
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    # boxes are offset back into the full-page frame
    for b in out["boxes"]:
        assert b[0] >= 10 - 1e-6 and b[1] >= 10 - 1e-6


def test_predict_bad_body(server):
    port = server["port"]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=b"not an image",
        headers={"Content-Type": "application/octet-stream"},
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected error"
    except urllib.error.HTTPError as e:
        assert e.code == 500


def test_cpp_client_builds_and_runs(server):
    exe = REPO / "cpp" / "kuzu_client"
    build = subprocess.run(
        ["make", "-C", str(REPO / "cpp")], capture_output=True, text=True
    )
    assert build.returncode == 0, build.stderr
    run = subprocess.run(
        [str(exe), "127.0.0.1", str(server["port"]), str(server["image"]), "0.001"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert run.returncode == 0, run.stderr
    assert "detections" in run.stdout


def test_export_stablehlo_roundtrip(trained_run):
    import jax.numpy as jnp

    from kuzu.api.export import export_detector, load_exported

    blob = export_detector(trained_run["run_dir"], batch=1, include_nms=True)
    assert blob.exists() and blob.stat().st_size > 0
    assert blob.with_suffix(".json").exists()
    fn = load_exported(blob)
    out = fn(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out["boxes"].shape == (1, 300, 4)
    assert out["valid"].dtype == bool


def test_export_saved_model_and_autobackend(trained_run):
    import numpy as np

    from kuzu.api.backend import AutoBackend
    from kuzu.core.config import load_config
    from kuzu.api.export import Exporter

    cfg = load_config(
        overrides={"model": str(trained_run["run_dir"]), "format": "saved_model",
                   "conf": 0.001, "batch": 1, "nms": True}
    )
    out = Exporter(cfg).run()
    assert out.exists()

    imgs = np.zeros((1, 64, 64, 3), np.float32)
    # saved_model backend
    be_tf = AutoBackend(out)
    r_tf = be_tf(imgs)
    assert r_tf["boxes"].shape == (1, 300, 4)
    # run-dir backend gives the same results
    be_run = AutoBackend(trained_run["run_dir"], conf=0.001)
    r_run = be_run(imgs)
    np.testing.assert_allclose(r_tf["boxes"], r_run["boxes"], atol=1e-3)
    np.testing.assert_allclose(r_tf["scores"], r_run["scores"], atol=1e-4)


def test_export_stablehlo_autobackend(trained_run):
    import numpy as np

    from kuzu.api.backend import AutoBackend
    from kuzu.api.export import export_detector

    blob = export_detector(trained_run["run_dir"], batch=1, include_nms=True, conf=0.001)
    be = AutoBackend(blob)
    r = be(np.zeros((1, 64, 64, 3), np.float32))
    assert r["boxes"].shape == (1, 300, 4)
    assert r["valid"].dtype == bool


def test_onnx_export_gate():
    """format=onnx is wired; in this image the tf2onnx hop raises a clear
    gated ImportError (dependency absent), never a silent no-op."""
    import pytest

    try:
        import tf2onnx  # noqa: F401

        has = True
    except ImportError:
        has = False
    if has:
        pytest.skip("tf2onnx present; full path covered by saved_model test")
    from kuzu.api.export import export_onnx

    with pytest.raises(ImportError, match="tf2onnx"):
        export_onnx("/nonexistent_saved_model", "/tmp/x.onnx")


def test_autobackend_onnx_gate(tmp_path):
    import pytest

    p = tmp_path / "m.onnx"
    p.write_bytes(b"\x08\x01")
    from kuzu.api.backend import AutoBackend

    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="onnxruntime"):
        AutoBackend(p)


def test_export_tflite_roundtrip(trained_run):
    """format=tflite end-to-end (reference exporter's TFLite target,
    ``engine/exporter.py:107``): convert via jax2tf -> tf.lite, then run the
    blob through the tflite interpreter (AutoBackend) and check inference
    parity against the run-dir (jax) backend."""
    import numpy as np

    from kuzu.api.backend import AutoBackend
    from kuzu.api.export import Exporter
    from kuzu.core.config import load_config

    cfg = load_config(
        overrides={"model": str(trained_run["run_dir"]), "format": "tflite",
                   "conf": 0.001, "batch": 1, "nms": True}
    )
    out = Exporter(cfg).run()
    assert out.exists() and out.suffix == ".tflite" and out.stat().st_size > 0

    imgs = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    r_tfl = AutoBackend(out)(imgs)
    assert r_tfl["boxes"].shape == (1, 300, 4)
    r_run = AutoBackend(trained_run["run_dir"], conf=0.001)(imgs)
    np.testing.assert_allclose(r_tfl["boxes"], r_run["boxes"], atol=2e-2)
    np.testing.assert_allclose(r_tfl["scores"], r_run["scores"], atol=1e-3)
    np.testing.assert_array_equal(r_tfl["valid"], r_run["valid"])
