"""On-chip cascade throughput benchmark: page -> columns -> text.

Reproduces the PERFORMANCE.md cascade measurement end-to-end: builds a
synthetic column-page corpus, trains a tiny column detector (yolov12n) and
recognizer (TrOCR) on the device, then times ``KuzushijiPipeline`` in both
the reference's sequential pattern (``process_page`` per page,
`/root/reference/scripts/inference.py:61-118` loops pages and crops) and
kuzu's batched path (``process_pages``: one detector forward + one
recognizer generate for the whole batch).

Usage: ``python -m kuzu.tools.cascade_bench [pages=32] [reps=3]``
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

CHAR_COLORS = {"a": (0, 0, 0), "b": (180, 0, 0), "c": (0, 0, 180)}
COLUMN_TEXTS = [["abc", "bca"], ["cab", "acb"]]


def _page(texts, size=192):
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (size, size), (250, 247, 240))
    d = ImageDraw.Draw(img)
    cols = []
    for ci, text in enumerate(texts):
        x = size - 60 - ci * 80
        y0, col_h = 10, 20 + len(text) * 45
        d.rectangle(
            [x - 4, y0 - 4, x + 36, y0 + col_h],
            outline=(120, 120, 110), width=2,
        )
        for j, ch in enumerate(text):
            d.rectangle(
                [x, y0 + 6 + j * 45, x + 32, y0 + 40 + j * 45],
                fill=CHAR_COLORS[ch],
            )
        cols.append((x - 4, y0 - 4, x + 36, y0 + col_h))
    return img, cols


def build_and_train(root: Path) -> dict:
    import yaml
    from PIL import Image, ImageDraw

    for split, n in (("train", 12), ("val", 4)):
        (root / "det/images" / split).mkdir(parents=True)
        (root / "det/labels" / split).mkdir(parents=True)
        for i in range(n):
            texts = COLUMN_TEXTS[i % 2]
            img, cols = _page(texts)
            img.save(root / "det/images" / split / f"{i}.jpg")
            lines = [
                f"0 {(x1+x2)/2/192:.5f} {(y1+y2)/2/192:.5f} "
                f"{(x2-x1)/192:.5f} {(y2-y1)/192:.5f}"
                for x1, y1, x2, y2 in cols
            ]
            (root / "det/labels" / split / f"{i}.txt").write_text(
                "\n".join(lines)
            )
    (root / "det/dataset.yaml").write_text(
        yaml.safe_dump(
            {"path": ".", "train": "images/train", "val": "images/val",
             "names": {0: "column"}, "nc": 1}
        )
    )
    all_texts = [t for pair in COLUMN_TEXTS for t in pair]
    for split, reps in (("train", 6), ("val", 1)):
        for sub in ("images", "labels"):
            (root / "ocr" / split / sub / "b").mkdir(parents=True)
        k = 0
        for _ in range(reps):
            for t in all_texts:
                img = Image.new("RGB", (40, 160), (250, 247, 240))
                d = ImageDraw.Draw(img)
                for j, ch in enumerate(t):
                    d.rectangle(
                        [4, 10 + j * 45, 36, 44 + j * 45],
                        fill=CHAR_COLORS[ch],
                    )
                img.save(root / "ocr" / split / "images" / "b" / f"{k}.png")
                (root / "ocr" / split / "labels" / "b" / f"{k}.txt").write_text(t)
                k += 1

    from kuzu.core.config import load_config
    from kuzu.tasks.detect import DetectTrainer
    from kuzu.tasks.recognize import RecognizeTrainer

    det_cfg = load_config(overrides=dict(
        task="detect", model="yolov12n", data=str(root / "det/dataset.yaml"),
        epochs=150, batch=8, imgsz=96, max_boxes=8, workers=0,
        dtype="bfloat16", project=str(root / "runs"),
        name="det", exist_ok=True,
    ))
    DetectTrainer(det_cfg).train()
    rec_cfg = load_config(overrides=dict(
        task="recognize", data=str(root / "ocr"), epochs=60, batch=6,
        imgsz=[160, 40], patch=8, enc_dim=32, enc_depth=1, enc_heads=2,
        dec_dim=32, dec_depth=1, dec_heads=2, max_label_length=8,
        optimizer="adamw", lr0=0.002, warmup_epochs=0.0, workers=0,
        project=str(root / "runs"), name="rec", exist_ok=True,
    ))
    RecognizeTrainer(rec_cfg).train()
    return {"det": root / "runs/detect/det", "rec": root / "runs/recognize/rec"}


def main(argv=None) -> None:
    kv = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    n_pages = int(kv.get("pages", 32))
    reps = int(kv.get("reps", 3))
    root = Path(kv.get("root") or tempfile.mkdtemp(prefix="cascade_bench"))
    runs = {"det": root / "runs/detect/det", "rec": root / "runs/recognize/rec"}
    if not (runs["det"] / "weights").exists():
        runs = build_and_train(root)

    pages_dir = root / "pages"
    pages_dir.mkdir(exist_ok=True)
    pages = []
    for i in range(n_pages):
        img, _ = _page(COLUMN_TEXTS[i % 2])
        p = pages_dir / f"p{i}.jpg"
        img.save(p)
        pages.append(p)

    from kuzu.pipeline.cascade import KuzushijiPipeline

    pipe = KuzushijiPipeline(
        column_model=runs["det"], recognizer=runs["rec"], conf=0.25 if "conf" not in kv else float(kv["conf"])
    )
    # warm (compile) both paths
    pipe.process_page(pages[0])
    pipe.process_pages(pages)

    t = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in pages[:8]:
            pipe.process_page(p)
        t.append((time.perf_counter() - t0) / 8)
    seq = 1.0 / min(t)

    t = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = pipe.process_pages(pages)
        t.append((time.perf_counter() - t0) / len(pages))
    bat = 1.0 / min(t)
    texts = [r.get("text", "") for r in out[:2]]
    ncols = float(np.mean([len(r["columns"]) for r in out]))
    print({"sequential_pages_per_s": round(seq, 2),
           "batched_pages_per_s": round(bat, 1),
           "n_pages": n_pages, "mean_cols_per_page": ncols,
           "sample_texts": texts})


if __name__ == "__main__":
    main()
