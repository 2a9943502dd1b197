"""YOLO dataset preparation tools.

Parity with the reference prep scripts (P20):
``prepare_yolo_dataset.py`` (column boxes -> per-page YOLO txt),
``prepare_yolo_character_dataset.py`` (+ ``create_dataset_yaml``),
``split_column_dataset.py`` (train/val/test split by source document +
unicode map), and the tiled dataset builders (``create_quadrant_dataset`` /
``create_multi_grid_dataset``) driving ``kuzu.pipeline.tiling``.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np
import yaml


def boxes_to_yolo_lines(
    boxes: np.ndarray, classes: np.ndarray | None, img_w: int, img_h: int
) -> list[str]:
    """xyxy pixel boxes -> 'cls cx cy w h' normalized lines."""
    lines = []
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(boxes, float)):
        c = int(classes[i]) if classes is not None else 0
        cx, cy = (x1 + x2) / 2 / img_w, (y1 + y2) / 2 / img_h
        w, h = (x2 - x1) / img_w, (y2 - y1) / img_h
        lines.append(f"{c} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
    return lines


def write_dataset_yaml(
    out_dir: str | Path, names: dict[int, str] | list[str], splits=("train", "val")
) -> Path:
    out_dir = Path(out_dir)
    if isinstance(names, list):
        names = dict(enumerate(names))
    spec = {
        "path": ".",
        **{s: f"images/{s}" for s in splits},
        "names": {int(k): v for k, v in names.items()},
        "nc": len(names),
    }
    p = out_dir / "dataset.yaml"
    out_dir.mkdir(parents=True, exist_ok=True)
    p.write_text(yaml.safe_dump(spec))
    return p


def build_detection_dataset(
    pages: dict[str, tuple[np.ndarray, np.ndarray | None]],
    image_dir: str | Path,
    out_dir: str | Path,
    names: dict[int, str] | list[str],
    split_fracs: tuple[float, float] = (0.8, 0.1),
    seed: int = 0,
    doc_key=lambda name: name.split("_")[0],
) -> Path:
    """pages: {image_name: (boxes xyxy, classes|None)} -> YOLO dir layout.

    Split is by source document (reference ``split_column_dataset`` —
    prevents leakage of pages from one book across splits).
    """
    image_dir, out_dir = Path(image_dir), Path(out_dir)
    docs = sorted({doc_key(n) for n in pages})
    rng = np.random.default_rng(seed)
    rng.shuffle(docs)
    n_train = max(int(len(docs) * split_fracs[0]), 1)
    n_val = max(int(len(docs) * split_fracs[1]), 1) if len(docs) > 1 else 0
    split_of = {}
    for i, d in enumerate(docs):
        split_of[d] = (
            "train" if i < n_train else ("val" if i < n_train + n_val else "test")
        )
    from PIL import Image

    for split in ("train", "val", "test"):
        (out_dir / "images" / split).mkdir(parents=True, exist_ok=True)
        (out_dir / "labels" / split).mkdir(parents=True, exist_ok=True)
    for name, (boxes, classes) in pages.items():
        split = split_of[doc_key(name)]
        cands = list(Path(image_dir).glob(f"{name}*"))
        if not cands:
            continue
        src = cands[0]
        dst = out_dir / "images" / split / src.name
        shutil.copy(src, dst)
        with Image.open(src) as im:
            w, h = im.size
        lines = boxes_to_yolo_lines(boxes, classes, w, h)
        (out_dir / "labels" / split / f"{src.stem}.txt").write_text("\n".join(lines))
    return write_dataset_yaml(out_dir, names, splits=("train", "val", "test"))


def build_tiled_dataset(
    src_dataset: str | Path,
    out_dir: str | Path,
    grid: int = 2,
    overlap: float = 0.15,
    splits=("train", "val"),
) -> Path:
    """Existing YOLO dataset -> tiled copy (reference create_quadrant/
    multi_grid_dataset): each page becomes grid^2 tiles, keeping only
    fully-contained boxes with rewritten coordinates."""
    import cv2

    from kuzu.data.yolo_dataset import load_dataset_yaml, read_yolo_labels, _label_path
    from kuzu.pipeline.tiling import grid_bounds, rewrite_boxes_for_tile

    spec = load_dataset_yaml(src_dataset)
    out_dir = Path(out_dir)
    for split in splits:
        img_dir = spec["root"] / spec[split]
        (out_dir / "images" / split).mkdir(parents=True, exist_ok=True)
        (out_dir / "labels" / split).mkdir(parents=True, exist_ok=True)
        for img_path in sorted(Path(img_dir).rglob("*")):
            if img_path.suffix.lower() not in {".jpg", ".jpeg", ".png"}:
                continue
            img = cv2.imread(str(img_path))
            if img is None:
                continue
            h, w = img.shape[:2]
            rows = read_yolo_labels(_label_path(img_path))
            classes = rows[:, 0].astype(int)
            cxcywh = rows[:, 1:5] * [w, h, w, h]
            boxes = np.concatenate(
                [cxcywh[:, :2] - cxcywh[:, 2:] / 2, cxcywh[:, :2] + cxcywh[:, 2:] / 2], 1
            )
            for ti, (nx1, ny1, nx2, ny2) in enumerate(grid_bounds(grid, overlap)):
                px = (int(nx1 * w), int(ny1 * h), int(nx2 * w), int(ny2 * h))
                tile = img[px[1] : px[3], px[0] : px[2]]
                tb, keep = rewrite_boxes_for_tile(boxes, px) if len(boxes) else (
                    boxes, np.zeros(0, bool)
                )
                name = f"{img_path.stem}_t{grid}x{grid}_{ti}"
                cv2.imwrite(str(out_dir / "images" / split / f"{name}.jpg"), tile)
                th, tw = tile.shape[:2]
                lines = boxes_to_yolo_lines(tb[keep], classes[keep], tw, th)
                (out_dir / "labels" / split / f"{name}.txt").write_text(
                    "\n".join(lines)
                )
    return write_dataset_yaml(out_dir, spec["names"], splits=splits)


def save_unicode_map(classes: list[str], out_path: str | Path) -> None:
    Path(out_path).write_text(
        json.dumps({c: i for i, c in enumerate(classes)}, ensure_ascii=False)
    )
