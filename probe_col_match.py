"""Column-stage e2e experiment #2: cache low-conf detections, then sweep
conf x same-region dedup. Dedup rule: walking predictions by descending
score, drop a box whose x-interval overlaps a kept box by > x_frac of the
narrower and whose y-interval overlaps by > y_frac of the shorter — i.e.
it reads largely the same region (survives plain NMS because corner IoU
stays low for partial-height duplicates)."""
import json
from pathlib import Path

import numpy as np

from kuzu.core.metrics import box_iou_np

ROOT = Path("runs/production_v4")
CACHE = Path("/tmp/col_dets.npz")


def dedup_columns(boxes, scores, x_frac=0.6, y_frac=0.6):
    order = np.argsort(-scores)
    keep = []
    for i in order:
        b = boxes[i]
        dup = False
        for j in keep:
            a = boxes[j]
            ox = min(a[2], b[2]) - max(a[0], b[0])
            oy = min(a[3], b[3]) - max(a[1], b[1])
            if (
                ox > x_frac * min(a[2] - a[0], b[2] - b[0])
                and oy > y_frac * min(a[3] - a[1], b[3] - b[1])
            ):
                dup = True
                break
        if not dup:
            keep.append(i)
    keep = np.array(sorted(keep))
    return boxes[keep], scores[keep]


def match_stats(gt, pb):
    if len(pb) == 0:
        return 0, len(gt), 0
    iou = box_iou_np(gt, pb)
    used = np.zeros(len(pb), bool)
    taken = np.zeros(len(gt), bool)
    m = 0
    for _ in range(min(len(gt), len(pb))):
        g, p = np.unravel_index(np.argmax(iou), iou.shape)
        if iou[g, p] < 0.5:
            break
        iou[g, :] = -1
        iou[:, p] = -1
        used[p] = taken[g] = True
        m += 1
    return m, int((~taken).sum()), int((~used).sum())


def load_dets():
    gt_by_page: dict[str, list[np.ndarray]] = {}
    header, *rows = (ROOT / "column_info.csv").read_text("utf-8").splitlines()
    for r in rows:
        col_img, orig, rest = r.split(",", 2)
        box_s, uni = rest.rsplit(",", 1)
        if not orig.startswith("val/"):
            continue
        box = np.array([float(x) for x in box_s.strip('"').split(",")])
        gt_by_page.setdefault(orig.split("/", 1)[1], []).append(box)
    pages = sorted(gt_by_page)[:8]

    if CACHE.exists():
        z = np.load(CACHE, allow_pickle=True)
        dets = list(z["dets"])
    else:
        from kuzu.tools.production import production_pipeline

        pipe = production_pipeline(ROOT, rec="ctc")
        pipe.column_det.cfg["conf"] = 0.001
        dets = []
        for page in pages:
            det = pipe.detect_columns(ROOT / "col/images/val" / page)
            dets.append(
                (np.asarray(det["boxes"]), np.asarray(det["scores"]))
            )
        np.savez(CACHE, dets=np.array(dets, dtype=object))
    return [
        (np.stack(gt_by_page[p]), b, s) for p, (b, s) in zip(pages, dets)
    ]


def main():
    dets = load_dets()
    for conf in (0.25, 0.10, 0.05):
        for rule in (None, (0.6, 0.6), (0.6, 0.4), (0.5, 0.5), (0.7, 0.7)):
            tot = dict(matched=0, missed=0, spurious=0)
            for gt, pb, ps in dets:
                keep = ps >= conf
                b, s = pb[keep], ps[keep]
                if rule and len(b):
                    b, s = dedup_columns(b, s, *rule)
                m, mi, sp = match_stats(gt, b)
                tot["matched"] += m
                tot["missed"] += mi
                tot["spurious"] += sp
            print(json.dumps({"conf": conf, "dedup": rule, **tot}))


if __name__ == "__main__":
    main()
