"""Column-stage e2e experiment #3: characterize the ~18 GT columns still
missed after col_conf=0.05 + dedup (e2e CER 0.154). For each missed GT
column, report: best IoU over ALL detections at conf 0.001, that box's
score (below-threshold? dedup victim? fragmentation?), and whether the
union of the top-2 overlapping detections would clear IoU 0.5 (split
detection). Uses the cached low-conf detections from probe_col_match."""
import json

import numpy as np

from kuzu.core.metrics import box_iou_np
from kuzu.pipeline.cascade import dedup_columns
from probe_col_match import load_dets, match_stats

CONF = 0.05


def iou_one(a, b):
    ox = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    oy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ox * oy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def main():
    dets = load_dets()
    misses = []
    for pi, (gt, pb, ps) in enumerate(dets):
        keep = ps >= CONF
        b, s = pb[keep], ps[keep]
        ki = dedup_columns(b, s)
        bk, sk = b[ki], s[ki]
        # replicate the greedy matcher to find which GT go unmatched
        iou = box_iou_np(gt, bk)
        taken = np.zeros(len(gt), bool)
        work = iou.copy()
        for _ in range(min(len(gt), len(bk))):
            g, p = np.unravel_index(np.argmax(work), work.shape)
            if work[g, p] < 0.5:
                break
            work[g, :] = -1
            work[:, p] = -1
            taken[g] = True
        for g in np.where(~taken)[0]:
            gbox = gt[g]
            # vs the FULL conf-0.001 pool (pre-threshold, pre-dedup)
            iou_all = box_iou_np(gbox[None], pb)[0] if len(pb) else np.zeros(0)
            j = int(np.argmax(iou_all)) if len(pb) else -1
            best_iou = float(iou_all[j]) if j >= 0 else 0.0
            best_score = float(ps[j]) if j >= 0 else 0.0
            in_kept = j >= 0 and bool((np.abs(bk - pb[j]).sum(1) < 1e-6).any())
            # union of top-2 overlapping dets (split detection?)
            order = np.argsort(-iou_all)[:2] if len(pb) else []
            union_iou = 0.0
            if len(order) == 2 and iou_all[order[1]] > 0.1:
                a, c = pb[order[0]], pb[order[1]]
                u = [min(a[0], c[0]), min(a[1], c[1]),
                     max(a[2], c[2]), max(a[3], c[3])]
                union_iou = iou_one(np.array(u), gbox)
            w, h = gbox[2] - gbox[0], gbox[3] - gbox[1]
            misses.append(dict(
                page=pi, w=round(float(w), 1), h=round(float(h), 1),
                best_iou=round(best_iou, 3), best_score=round(best_score, 3),
                survives_pipeline=in_kept,
                union2_iou=round(union_iou, 3),
            ))
    for m in misses:
        print(json.dumps(m))
    # buckets
    n = len(misses)
    not_seen = sum(m["best_iou"] < 0.25 for m in misses)
    split = sum(m["best_iou"] >= 0.25 and m["union2_iou"] >= 0.5 for m in misses)
    low_conf = sum(
        m["best_iou"] >= 0.5 and m["best_score"] < CONF for m in misses
    )
    dedup_victim = sum(
        m["best_iou"] >= 0.5 and m["best_score"] >= CONF
        and not m["survives_pipeline"] for m in misses
    )
    stolen = sum(
        m["best_iou"] >= 0.5 and m["best_score"] >= CONF
        and m["survives_pipeline"] for m in misses
    )
    print(json.dumps(dict(
        total=n, never_detected=not_seen, split_detection=split,
        below_conf=low_conf, dedup_victim=dedup_victim,
        matched_to_other_gt=stolen,
    )))


if __name__ == "__main__":
    main()
