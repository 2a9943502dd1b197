"""Dataset analysis utilities.

Capability parity with the reference's analysis scripts (P38):
``analyze_bbox_sizes.py``, ``analyze_text_length.py``, ``plot_char_counts.py``
/ ``count_character.py``, ``count_pages.py`` / ``count_yolo_dataset.py``,
``convert_yolo_to_coco.py`` and ``create_small_coco_dataset.py``.
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import numpy as np


def analyze_bbox_sizes(dataset_yaml: str | Path, split: str = "train") -> dict:
    """Width/height/area stats of all GT boxes (pixels)."""
    from kuzu.data.yolo_dataset import (
        IMG_EXTS,
        _label_path,
        load_dataset_yaml,
        read_yolo_labels,
    )
    from PIL import Image

    spec = load_dataset_yaml(dataset_yaml)
    img_dir = spec["root"] / spec[split]
    ws, hs = [], []
    n_images = 0
    for p in sorted(Path(img_dir).rglob("*")):
        if p.suffix.lower() not in IMG_EXTS:
            continue
        n_images += 1
        with Image.open(p) as im:
            iw, ih = im.size
        rows = read_yolo_labels(_label_path(p))
        if len(rows):
            ws.extend((rows[:, 3] * iw).tolist())
            hs.extend((rows[:, 4] * ih).tolist())
    ws, hs = np.asarray(ws), np.asarray(hs)
    if len(ws) == 0:
        return {"n_images": n_images, "n_boxes": 0}
    return {
        "n_images": n_images,
        "n_boxes": len(ws),
        "width": {"mean": float(ws.mean()), "median": float(np.median(ws)), "p95": float(np.percentile(ws, 95))},
        "height": {"mean": float(hs.mean()), "median": float(np.median(hs)), "p95": float(np.percentile(hs, 95))},
        "area_median": float(np.median(ws * hs)),
        "aspect_median": float(np.median(hs / np.maximum(ws, 1e-6))),
    }


def analyze_text_lengths(texts: list[str]) -> dict:
    lens = np.asarray([len(t) for t in texts])
    if len(lens) == 0:
        return {"n": 0}
    return {
        "n": int(len(lens)),
        "mean": float(lens.mean()),
        "median": float(np.median(lens)),
        "max": int(lens.max()),
        "p99": float(np.percentile(lens, 99)),
    }


def char_counts(texts: list[str]) -> Counter:
    """Character frequency (reference count_character / plot_char_counts)."""
    c: Counter = Counter()
    for t in texts:
        c.update(t)
    return c


def split_by_threshold(counts: Counter, threshold: int) -> tuple[dict, dict]:
    """Reference character_count_above/below_threshold.json outputs."""
    above = {k: v for k, v in counts.items() if v >= threshold}
    below = {k: v for k, v in counts.items() if v < threshold}
    return above, below


def yolo_to_coco(
    dataset_yaml: str | Path, split: str = "train", out_path: str | Path | None = None
) -> dict:
    """YOLO-format split -> COCO detection JSON (convert_yolo_to_coco.py)."""
    from kuzu.data.yolo_dataset import (
        IMG_EXTS,
        _label_path,
        load_dataset_yaml,
        read_yolo_labels,
    )
    from PIL import Image

    spec = load_dataset_yaml(dataset_yaml)
    img_dir = spec["root"] / spec[split]
    images, annotations = [], []
    ann_id = 1
    for img_id, p in enumerate(sorted(Path(img_dir).rglob("*")), start=1):
        if p.suffix.lower() not in IMG_EXTS:
            continue
        with Image.open(p) as im:
            w, h = im.size
        images.append(
            {"id": img_id, "file_name": p.name, "width": w, "height": h}
        )
        for row in read_yolo_labels(_label_path(p)):
            c, cx, cy, bw, bh = (float(v) for v in row)
            x = (cx - bw / 2) * w
            y = (cy - bh / 2) * h
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": img_id,
                    "category_id": int(c) + 1,  # COCO ids are 1-based
                    "bbox": [x, y, bw * w, bh * h],
                    "area": bw * w * bh * h,
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": int(i) + 1, "name": n} for i, n in spec["names"].items()
        ],
    }
    if out_path:
        Path(out_path).write_text(json.dumps(coco))
    return coco


def auto_batch_size(
    bytes_per_sample: float,
    memory_fraction: float = 0.6,
    device_memory_bytes: float | None = None,
    max_batch: int = 1024,
) -> int:
    """Largest power-of-two batch fitting in device memory
    (reference ``utils/autobatch.py`` CUDA-memory fit, TPU HBM version)."""
    import jax

    if device_memory_bytes is None:
        stats = jax.devices()[0].memory_stats() or {}
        device_memory_bytes = stats.get("bytes_limit", 16 * 1024**3)
    budget = device_memory_bytes * memory_fraction
    b = 1
    while b * 2 <= max_batch and (b * 2) * bytes_per_sample <= budget:
        b *= 2
    return b
