"""Column-crop experiment: isolate why matched-column CER (0.096, detected
crops) is ~3x the recognizer's GT-crop CER (0.035). Recognize GT val
columns cropped from the PAGE under different geometry conventions:

  a) exact csv box (training crops were GT chars +4px, saved at synth time)
  b) the cascade's margin rule (5% of box w/h per side — ~25px vertically)
  c) csv box + uniform +-6px edge jitter (detector localization noise)
  d) margin rule with y-margin capped at 5% of box WIDTH both axes
"""
import json
from pathlib import Path

import cv2
import numpy as np

from kuzu.core.metrics import character_error_rate
from kuzu.data.ocr_datasets import decode_unicode_ids
from kuzu.tools.production import production_pipeline

ROOT = Path("runs/production_v4")


def crop(img, box, mx, my):
    h, w = img.shape[:2]
    x1, y1, x2, y2 = box
    xa, ya = max(int(x1 - mx), 0), max(int(y1 - my), 0)
    xb, yb = min(int(x2 + mx), w), min(int(y2 + my), h)
    return img[ya:yb, xa:xb]


def main():
    gt = []
    header, *rows = (ROOT / "column_info.csv").read_text("utf-8").splitlines()
    for r in rows:
        col_img, orig, rest = r.split(",", 2)
        box_s, uni = rest.rsplit(",", 1)
        if not orig.startswith("val/"):
            continue
        box = np.array([float(x) for x in box_s.strip('"').split(",")])
        gt.append((orig.split("/", 1)[1], box, decode_unicode_ids(uni)))
    pages = {p: cv2.cvtColor(cv2.imread(str(ROOT / "col/images/val" / p)),
                             cv2.COLOR_BGR2RGB)
             for p in {g[0] for g in gt}}
    pipe = production_pipeline(ROOT, rec="ctc")
    rng = np.random.default_rng(0)

    variants = {}
    variants["a_exact"] = [crop(pages[p], b, 0, 0) for p, b, _ in gt]
    variants["b_margin5pct"] = [
        crop(pages[p], b, 0.05 * (b[2] - b[0]), 0.05 * (b[3] - b[1]))
        for p, b, _ in gt
    ]
    variants["c_jitter6"] = [
        crop(pages[p], b + rng.integers(-6, 7, 4), 0, 0) for p, b, _ in gt
    ]
    variants["d_margin_w_both"] = [
        crop(pages[p], b, 0.05 * (b[2] - b[0]), 0.05 * (b[2] - b[0]))
        for p, b, _ in gt
    ]
    texts = [t for _, _, t in gt]
    out = {}
    for name, crops in variants.items():
        preds = pipe.recognize_crops(crops)
        out[name] = round(character_error_rate(preds, texts), 4)
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
