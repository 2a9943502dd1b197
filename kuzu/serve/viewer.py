"""Dataset viewer web app: browse dataset images + annotations with paging.

Capability parity with the reference's Gradio apps —
``dataset_viewer.py:15-179`` (parquet-shard browser with pagination) and the
annotation visualization of ``gui_column_detection.py`` — on the same
stdlib http.server used by ``kuzu.serve.app``. Supports YOLO-format
detection datasets (boxes drawn) and column_info.csv recognition datasets
(crop + decoded text).
"""

from __future__ import annotations

import base64
import html
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

PAGE = """<!doctype html><html><head><title>kuzu dataset viewer</title>
<style>body{font-family:sans-serif;max-width:1000px;margin:1em auto}
.grid{display:grid;grid-template-columns:repeat(4,1fr);gap:8px}
.card{border:1px solid #ccc;padding:4px;font-size:11px}
img{width:100%%}.nav a{margin:0 8px}</style></head><body>
<h3>kuzu dataset viewer — %(title)s</h3>
<div class=nav>page %(page)d / %(pages)d
<a href="?page=%(prev)d">prev</a><a href="?page=%(next)d">next</a>
(%(total)d samples)</div>
<div class=grid>%(cards)s</div></body></html>"""


class DatasetBrowser:
    """Loads samples lazily; renders annotated thumbnails."""

    def __init__(self, source: str | Path, per_page: int = 16):
        self.source = Path(source)
        self.per_page = per_page
        if self.source.suffix == ".csv":
            import pandas as pd

            self.mode = "column_info"
            self.df = pd.read_csv(self.source)
            self.total = len(self.df)
        elif self.source.suffix == ".yaml":
            from kuzu.data.yolo_dataset import load_dataset_yaml

            self.mode = "yolo"
            self.spec = load_dataset_yaml(self.source)
            root = self.spec["root"] / self.spec["train"]
            self.images = sorted(
                p
                for p in Path(root).rglob("*")
                if p.suffix.lower() in {".jpg", ".png", ".jpeg"}
            )
            self.total = len(self.images)
        else:
            raise ValueError("source must be a column_info.csv or dataset.yaml")

    def _thumb(self, img, boxes=None, caption="") -> str:
        import cv2

        arr = np.asarray(img)
        if boxes is not None:
            arr = arr.copy()
            for b in boxes:
                x1, y1, x2, y2 = (int(v) for v in b[:4])
                cv2.rectangle(arr, (x1, y1), (x2, y2), (0, 200, 0), 2)
        scale = 320 / max(arr.shape[:2])
        if scale < 1:
            arr = cv2.resize(arr, (int(arr.shape[1] * scale), int(arr.shape[0] * scale)))
        ok, png = cv2.imencode(".png", cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
        b64 = base64.b64encode(png.tobytes()).decode() if ok else ""
        return (
            f'<div class=card><img src="data:image/png;base64,{b64}">'
            f"{html.escape(caption)}</div>"
        )

    def render(self, page: int) -> str:
        import cv2

        pages = max((self.total + self.per_page - 1) // self.per_page, 1)
        page = max(0, min(page, pages - 1))
        lo = page * self.per_page
        hi = min(lo + self.per_page, self.total)
        cards = []
        if self.mode == "yolo":
            from kuzu.data.yolo_dataset import _label_path, read_yolo_labels

            for p in self.images[lo:hi]:
                img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
                h, w = img.shape[:2]
                rows = read_yolo_labels(_label_path(p))
                cxcywh = rows[:, 1:5] * [w, h, w, h]
                boxes = np.concatenate(
                    [cxcywh[:, :2] - cxcywh[:, 2:] / 2, cxcywh[:, :2] + cxcywh[:, 2:] / 2], 1
                ) if len(rows) else []
                cards.append(self._thumb(img, boxes, f"{p.name} ({len(rows)} boxes)"))
        else:
            from kuzu.data.tokenizer import decode_unicode_ids

            for _, row in self.df.iloc[lo:hi].iterrows():
                p = self.source.parent / str(row["column_image"])
                img = cv2.imread(str(p))
                if img is None:
                    continue
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                boxes = []
                if "char_boxes_in_column" in row and isinstance(
                    row["char_boxes_in_column"], str
                ):
                    try:
                        boxes = json.loads(row["char_boxes_in_column"])
                    except json.JSONDecodeError:
                        pass
                text = decode_unicode_ids(str(row.get("unicode_ids", "")))
                cards.append(self._thumb(img, boxes, text))
        return PAGE % {
            "title": html.escape(str(self.source.name)),
            "page": page + 1,
            "pages": pages,
            "prev": max(page - 1, 0),
            "next": min(page + 1, pages - 1),
            "total": self.total,
            "cards": "\n".join(cards),
        }


def make_viewer_server(source: str | Path, host: str = "127.0.0.1", port: int = 8001):
    browser = DatasetBrowser(source)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            page = int(q.get("page", ["0"])[0])
            body = browser.render(page).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("kuzu dataset viewer")
    ap.add_argument("--source", required=True, help="dataset.yaml or column_info.csv")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8001)
    args = ap.parse_args(argv)
    srv = make_viewer_server(args.source, args.host, args.port)
    print(f"viewing {args.source} on http://{args.host}:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
