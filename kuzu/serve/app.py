"""Inference web app: upload a page image, get detections (JSON or HTML).

Capability parity with the reference's FastAPI+htmx app
(``scripts/yolo_inference_app.py:32-193``): lazy model cache, POST /predict
with conf/iou/max_det, region prediction (``/predict-region``), and a
score-colored box visualization. Built on stdlib ``http.server`` (threaded)
— no FastAPI dependency; the JSON API doubles as the contract for the
native C++ client (``cpp/kuzu_client.cpp``).
"""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

_model_lock = threading.Lock()
_model_cache: dict = {}

INDEX_HTML = """<!doctype html>
<html><head><title>kuzu detector</title>
<style>body{font-family:sans-serif;max-width:760px;margin:2em auto}
img{max-width:100%%}.r{margin-top:1em}</style></head>
<body><h2>kuzu — kuzushiji detector</h2>
<form method=post action=/predict enctype=multipart/form-data>
<input type=file name=file accept=image/*>
conf <input name=conf value=0.25 size=4>
iou <input name=iou value=0.45 size=4>
<button>Predict</button></form>
<div class=r>%s</div></body></html>"""


def get_predictor(
    run_dir: str, conf: float, iou: float, max_det: int, dp: int = 0
):
    key = (run_dir, conf, iou, max_det, dp)
    with _model_lock:
        if key not in _model_cache:
            from kuzu.core.config import load_config
            from kuzu.tasks.detect import DetectPredictor

            _model_cache[key] = DetectPredictor(
                load_config(
                    overrides={
                        "model": run_dir,
                        "conf": conf,
                        "iou": iou,
                        "max_det": max_det,
                        "dp": dp,
                    }
                )
            )
        return _model_cache[key]


def draw_boxes(img: np.ndarray, boxes: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Score-colored rectangles (green high, red low) — reference draw_boxes."""
    import cv2

    out = img.copy()
    for (x1, y1, x2, y2), s in zip(boxes.astype(int), scores):
        color = (int(255 * (1 - s)), int(255 * s), 0)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
    return out


def _parse_multipart(body: bytes, content_type: str) -> dict[str, bytes]:
    """Minimal multipart/form-data parser (file + simple fields)."""
    boundary = None
    for part in content_type.split(";"):
        part = part.strip()
        if part.startswith("boundary="):
            boundary = part[len("boundary=") :].strip('"')
    if not boundary:
        return {}
    delim = b"--" + boundary.encode()
    fields: dict[str, bytes] = {}
    for chunk in body.split(delim):
        chunk = chunk.strip(b"\r\n")
        if not chunk or chunk == b"--":
            continue
        if b"\r\n\r\n" not in chunk:
            continue
        header, value = chunk.split(b"\r\n\r\n", 1)
        name = None
        for line in header.split(b"\r\n"):
            if b"Content-Disposition" in line:
                for tok in line.split(b";"):
                    tok = tok.strip()
                    if tok.startswith(b'name="'):
                        name = tok[6:-1].decode()
        if name:
            fields[name] = value
    return fields


class KuzuHandler(BaseHTTPRequestHandler):
    run_dir: str = ""
    dp: int = 0  # data-parallel serving mesh size (0 = single device)

    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, code: int, body: bytes, ctype: str = "application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if urlparse(self.path).path in ("/", "/index.html"):
            self._send(200, (INDEX_HTML % "").encode(), "text/html")
        elif urlparse(self.path).path == "/health":
            self._send(200, b'{"status": "ok"}')
        else:
            self._send(404, b'{"error": "not found"}')

    def do_POST(self):
        parsed = urlparse(self.path)
        qs = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        ctype = self.headers.get("Content-Type", "")
        if ctype.startswith("multipart/form-data"):
            fields = _parse_multipart(body, ctype)
            image_bytes = fields.get("file", b"")
            for k in ("conf", "iou", "max_det", "x1", "y1", "x2", "y2"):
                if k in fields:
                    qs.setdefault(k, fields[k].decode())
        else:
            image_bytes = body
        if not image_bytes:
            self._send(400, b'{"error": "no image"}')
            return
        try:
            result = self._predict(parsed.path, image_bytes, qs)
        except Exception as e:  # pragma: no cover
            self._send(500, json.dumps({"error": str(e)}).encode())
            return
        accept = self.headers.get("Accept", "")
        if "text/html" in accept:
            img_tag = (
                f'<img src="data:image/png;base64,{result.pop("image_b64")}">'
                if "image_b64" in result
                else ""
            )
            html = INDEX_HTML % (
                f"<p>{len(result['boxes'])} detections</p>" + img_tag
            )
            self._send(200, html.encode(), "text/html")
        else:
            result.pop("image_b64", None)
            self._send(200, json.dumps(result).encode())

    def _predict(self, path: str, image_bytes: bytes, qs: dict) -> dict:
        import cv2

        conf = float(qs.get("conf", 0.25))
        iou = float(qs.get("iou", 0.45))
        max_det = int(qs.get("max_det", 2000))
        arr = cv2.imdecode(
            np.frombuffer(image_bytes, np.uint8), cv2.IMREAD_COLOR
        )
        if arr is None:
            raise ValueError("could not decode image")
        if path == "/predict-region":
            x1, y1 = int(float(qs.get("x1", 0))), int(float(qs.get("y1", 0)))
            x2 = int(float(qs.get("x2", arr.shape[1])))
            y2 = int(float(qs.get("y2", arr.shape[0])))
            arr = arr[y1:y2, x1:x2]
            offset = np.array([x1, y1, x1, y1], np.float32)
        else:
            offset = np.zeros(4, np.float32)

        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            cv2.imwrite(f.name, arr)
            tmp = f.name
        try:
            predictor = get_predictor(
                self.run_dir, conf, iou, max_det, dp=self.dp
            )
            r = predictor([tmp])[0]
        finally:
            Path(tmp).unlink(missing_ok=True)
        boxes = r["boxes"] + offset
        vis = draw_boxes(
            cv2.cvtColor(arr, cv2.COLOR_BGR2RGB), r["boxes"], r["scores"]
        )
        ok, png = cv2.imencode(".png", cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        return {
            "boxes": boxes.round(2).tolist(),
            "scores": [round(float(s), 4) for s in r["scores"]],
            "classes": [int(c) for c in r["classes"]],
            "image_b64": base64.b64encode(png.tobytes()).decode() if ok else "",
        }


def make_server(
    run_dir: str, host: str = "127.0.0.1", port: int = 8000, dp: int = 0
):
    handler = type("Handler", (KuzuHandler,), {"run_dir": run_dir, "dp": dp})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    import argparse

    from kuzu.core.cache import enable_compilation_cache
    from kuzu.core.mesh import force_cpu_if_requested

    enable_compilation_cache()
    force_cpu_if_requested()
    ap = argparse.ArgumentParser("kuzu serve")
    ap.add_argument("--model", required=True, help="trained detect run dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--dp", type=int, default=0,
                    help="shard prediction batches over a dp-device mesh")
    args = ap.parse_args(argv)
    server = make_server(args.model, args.host, args.port, dp=args.dp)
    print(f"kuzu serving {args.model} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
