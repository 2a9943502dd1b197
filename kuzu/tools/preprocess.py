"""Page -> column ETL: DBSCAN clustering of character boxes into columns.

Parity with the reference preprocessing
(``scripts/data_preprocessing.py`` / ``data_preprocessv2.py``): per-page char
annotations (CSV columns ``Image, X, Y, Width, Height, Unicode``) are
clustered into vertical text columns by DBSCAN over x-centers with
``eps = median char width * ratio`` (ratios 0.1/0.3/0.5 tried, fewest columns
wins — ``:246-254``); chars sort top-to-bottom within a column, columns sort
left-to-right; crops take a ``0.2 * median_width`` margin; output is
``column_info.csv`` with the reference schema (``column_image,
original_image, box_in_original, char_boxes_in_column, unicode_ids``) plus
v2's overlap-based column merge (``merge_overlapping_columns :699``).
"""

from __future__ import annotations

import json
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np


def cluster_columns(
    boxes: np.ndarray,  # (N, 4) xyxy
    eps_ratio: float = 0.3,
    min_samples: int = 1,
) -> list[np.ndarray]:
    """Group char boxes into columns; returns index arrays, chars sorted
    top-to-bottom, columns left-to-right."""
    if len(boxes) == 0:
        return []
    from sklearn.cluster import DBSCAN

    widths = boxes[:, 2] - boxes[:, 0]
    valid = widths[widths > 0]
    median_w = float(np.median(valid)) if len(valid) else 10.0
    x_centers = ((boxes[:, 0] + boxes[:, 2]) / 2).reshape(-1, 1)
    labels = DBSCAN(eps=median_w * eps_ratio, min_samples=min_samples).fit(
        x_centers
    ).labels_
    # noise points become singleton columns
    next_label = labels.max() + 1 if (labels != -1).any() else 0
    labels = labels.copy()
    for i in np.where(labels == -1)[0]:
        labels[i] = next_label
        next_label += 1
    columns = []
    for lab in np.unique(labels):
        idx = np.where(labels == lab)[0]
        idx = idx[np.argsort(boxes[idx, 1])]  # top to bottom
        columns.append(idx)
    columns.sort(key=lambda idx: boxes[idx, 0].min())  # left to right
    return columns


def best_column_clustering(
    boxes: np.ndarray, ratios: tuple[float, ...] = (0.1, 0.3, 0.5)
) -> list[np.ndarray]:
    """Try several eps ratios, keep the clustering with fewest columns."""
    candidates = [cluster_columns(boxes, r) for r in ratios]
    candidates = [c for c in candidates if c]
    if not candidates:
        return []
    return min(candidates, key=len)


def merge_overlapping_columns(
    col_boxes: list[tuple[float, float, float, float]],
    overlap_threshold: float = 0.5,
) -> list[list[int]]:
    """Merge columns whose x-extent overlap exceeds the threshold (v2
    ``merge_overlapping_columns``). Returns groups of column indices."""
    n = len(col_boxes)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            x1a, _, x2a, _ = col_boxes[i]
            x1b, _, x2b, _ = col_boxes[j]
            inter = min(x2a, x2b) - max(x1a, x1b)
            if inter <= 0:
                continue
            if inter / max(min(x2a - x1a, x2b - x1b), 1e-6) > overlap_threshold:
                parent[find(i)] = find(j)
    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return list(groups.values())


def process_page(
    image_path: str | Path,
    char_rows: np.ndarray,  # (N, 4) xyxy pixel boxes
    unicodes: list[str],
    out_dir: str | Path,
    merge_overlaps: bool = True,
) -> list[dict]:
    """Crop columns from one page; returns column_info rows."""
    from PIL import Image

    image_path = Path(image_path)
    out_dir = Path(out_dir)
    (out_dir / "columns").mkdir(parents=True, exist_ok=True)
    img = Image.open(image_path).convert("RGB")
    w, h = img.size
    columns = best_column_clustering(char_rows)
    if merge_overlaps and len(columns) > 1:
        col_boxes = [
            (
                float(char_rows[idx, 0].min()),
                float(char_rows[idx, 1].min()),
                float(char_rows[idx, 2].max()),
                float(char_rows[idx, 3].max()),
            )
            for idx in columns
        ]
        groups = merge_overlapping_columns(col_boxes)
        merged = []
        for g in groups:
            idx = np.concatenate([columns[i] for i in g])
            idx = idx[np.argsort(char_rows[idx, 1])]
            merged.append(idx)
        merged.sort(key=lambda idx: char_rows[idx, 0].min())
        columns = merged

    widths = char_rows[:, 2] - char_rows[:, 0]
    median_w = float(np.median(widths[widths > 0])) if (widths > 0).any() else 25.0
    margin = median_w * 0.2
    rows = []
    for ci, idx in enumerate(columns):
        cb = char_rows[idx]
        x1 = max(0, int(cb[:, 0].min() - margin))
        y1 = max(0, int(cb[:, 1].min() - margin))
        x2 = min(w, int(cb[:, 2].max() + margin))
        y2 = min(h, int(cb[:, 3].max() + margin))
        crop = img.crop((x1, y1, x2, y2))
        name = f"{image_path.stem}_col{ci:03d}.jpg"
        crop.save(out_dir / "columns" / name, quality=95)
        rel_boxes = cb - [x1, y1, x1, y1]
        rows.append(
            {
                "column_image": f"columns/{name}",
                "original_image": image_path.name,
                "box_in_original": json.dumps([x1, y1, x2, y2]),
                "char_boxes_in_column": json.dumps(
                    rel_boxes.round(1).tolist()
                ),
                "unicode_ids": " ".join(unicodes[i] for i in idx),
            }
        )
    return rows


def load_page_csv(csv_path: str | Path) -> dict[str, tuple[np.ndarray, list[str]]]:
    """Reference per-page char CSV: ``Image, X, Y, Width, Height, Unicode``."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    out = {}
    for image, grp in df.groupby("Image"):
        boxes = np.stack(
            [
                grp["X"].to_numpy(float),
                grp["Y"].to_numpy(float),
                grp["X"].to_numpy(float) + grp["Width"].to_numpy(float),
                grp["Y"].to_numpy(float) + grp["Height"].to_numpy(float),
            ],
            axis=1,
        )
        out[str(image)] = (boxes, [str(u) for u in grp["Unicode"]])
    return out


def preprocess_dataset(
    csv_path: str | Path,
    image_dir: str | Path,
    out_dir: str | Path,
    workers: int = 4,
) -> Path:
    """Full ETL: char CSV + page images -> column crops + column_info.csv."""
    import pandas as pd

    pages = load_page_csv(csv_path)
    image_dir = Path(image_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    jobs = []
    for name, (boxes, unis) in pages.items():
        cands = list(image_dir.glob(f"{name}*"))
        if not cands:
            continue
        jobs.append((cands[0], boxes, unis))
    all_rows: list[dict] = []
    if workers > 1 and len(jobs) > 1:
        with ProcessPoolExecutor(workers) as pool:
            futs = [
                pool.submit(process_page, p, b, u, out_dir) for p, b, u in jobs
            ]
            for f in futs:
                all_rows.extend(f.result())
    else:
        for p, b, u in jobs:
            all_rows.extend(process_page(p, b, u, out_dir))
    csv_out = out_dir / "column_info.csv"
    pd.DataFrame(all_rows).to_csv(csv_out, index=False)
    return csv_out
