"""YOLO-format detection dataset + host-side augmentation pipeline.

Capability parity with the reference data stack: ``YOLODataset`` label
parsing (``yolov12/ultralytics/data/dataset.py``), ``dataset.yaml`` contract
(path/train/val/names — ``src/configs/data/character_detection.yaml``), and
the v8 augmentation recipe (``data/augment.py``: Mosaic 4-way, random
affine scale/translate, HSV jitter, horizontal flip, LetterBox). Outputs are
TPU-ready fixed shapes: image (S, S, 3) float32 [0,1], boxes padded to
``max_boxes`` xyxy pixels + labels + mask.

Augmentation runs on host numpy/cv2 (cheap, overlapped with device compute by
the threaded loader); the normalize/letterbox math matches ``kuzu.ops.letterbox``.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np
import yaml

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def load_dataset_yaml(path: str | Path) -> dict:
    with open(path) as f:
        d = yaml.safe_load(f)
    root = Path(d.get("path", Path(path).parent))
    if not root.is_absolute():
        root = Path(path).parent / root
    names = d.get("names", {})
    if isinstance(names, list):
        names = dict(enumerate(names))
    return {
        "root": root,
        "train": d.get("train", "images/train"),
        "val": d.get("val", "images/val"),
        "names": {int(k): v for k, v in names.items()},
        "nc": int(d.get("nc", len(names) or 1)),
    }


def _label_path(img_path: Path) -> Path:
    parts = list(img_path.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            break
    return Path(*parts).with_suffix(".txt")


def read_yolo_labels(path: Path) -> np.ndarray:
    """(N, 5) rows of (cls, cx, cy, w, h) normalized; empty -> (0, 5)."""
    if not path.exists():
        return np.zeros((0, 5), np.float32)
    rows = []
    for line in path.read_text().splitlines():
        vals = line.split()
        if len(vals) >= 5:
            rows.append([float(v) for v in vals[:5]])
    return np.asarray(rows, np.float32) if rows else np.zeros((0, 5), np.float32)


def letterbox_np(
    img: np.ndarray, size: int, fill: int = 114
) -> tuple[np.ndarray, float, tuple[float, float]]:
    """cv2 letterbox to (size, size); returns (canvas, gain, (pad_x, pad_y))."""
    h, w = img.shape[:2]
    gain = min(size / h, size / w)
    nw, nh = max(int(round(w * gain)), 1), max(int(round(h * gain)), 1)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((size, size, 3), fill, np.uint8)
    px, py = (size - nw) // 2, (size - nh) // 2
    canvas[py : py + nh, px : px + nw] = resized
    return canvas, gain, (px, py)


def hsv_jitter(
    img: np.ndarray, rng: np.random.Generator, h=0.015, s=0.7, v=0.4
) -> np.ndarray:
    if h == s == v == 0:
        return img
    r = rng.uniform(-1, 1, 3) * [h, s, v] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    lut_h = ((np.arange(256) * r[0]) % 180).astype(np.uint8)
    lut_s = np.clip(np.arange(256) * r[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(np.arange(256) * r[2], 0, 255).astype(np.uint8)
    out = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    return cv2.cvtColor(out, cv2.COLOR_HSV2RGB)


def random_affine(
    img: np.ndarray,
    boxes: np.ndarray,  # (N, 4) xyxy pixels
    labels: np.ndarray,
    rng: np.random.Generator,
    size: int,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    fill: int = 114,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random scale/rotate/translate with box rewrite + degenerate filtering
    (reference ``RandomPerspective`` without shear/perspective)."""
    h, w = img.shape[:2]
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    cx, cy = w / 2, h / 2
    M = cv2.getRotationMatrix2D((cx, cy), a, s)
    M[0, 2] += rng.uniform(0.5 - translate, 0.5 + translate) * size - cx
    M[1, 2] += rng.uniform(0.5 - translate, 0.5 + translate) * size - cy
    out = cv2.warpAffine(img, M, (size, size), borderValue=(fill,) * 3)
    if len(boxes) == 0:
        return out, boxes, labels
    corners = np.concatenate(
        [
            boxes[:, [0, 1]],
            boxes[:, [2, 1]],
            boxes[:, [2, 3]],
            boxes[:, [0, 3]],
        ],
        axis=0,
    )  # (4N, 2)
    ones = np.ones((len(corners), 1))
    warped = (np.concatenate([corners, ones], 1) @ M.T).reshape(4, -1, 2)
    new = np.concatenate(
        [warped.min(axis=0), warped.max(axis=0)], axis=1
    ).astype(np.float32)
    new[:, [0, 2]] = new[:, [0, 2]].clip(0, size)
    new[:, [1, 3]] = new[:, [1, 3]].clip(0, size)
    # filter degenerate boxes (w/h < 2px or area collapsed)
    wh = new[:, 2:] - new[:, :2]
    old_wh = (boxes[:, 2:] - boxes[:, :2]) * s
    keep = (
        (wh > 2).all(1)
        & (wh.prod(1) / np.maximum(old_wh.prod(1), 1e-6) > 0.1)
    )
    return out, new[keep], labels[keep]


class YoloDetectionDataset:
    """Detection samples with the v8 augmentation recipe, padded targets."""

    def __init__(
        self,
        spec: str | Path | dict,
        split: str = "train",
        imgsz: int = 640,
        max_boxes: int = 300,
        augment: bool = True,
        hyp: dict | None = None,
        seed: int = 0,
    ):
        if isinstance(spec, (str, Path)):
            spec = load_dataset_yaml(spec)
        self.spec = spec
        self.imgsz = imgsz
        self.max_boxes = max_boxes
        self.augment = augment and split == "train"
        self.hyp = {
            "mosaic": 1.0,
            "fliplr": 0.5,
            "flipud": 0.0,
            "hsv_h": 0.015,
            "hsv_s": 0.7,
            "hsv_v": 0.4,
            "degrees": 0.0,
            "translate": 0.1,
            "scale": 0.5,
            # photometric extras (project Albumentations parity, default off)
            "noise": 0.0,
            "blur": 0.0,
            "jpeg": 0.0,
            "distort": 0.0,
            "erasing": 0.0,
            **(hyp or {}),
        }
        self.seed = seed
        img_dir = self.spec["root"] / self.spec[split]
        self.images = sorted(
            p for p in Path(img_dir).rglob("*") if p.suffix.lower() in IMG_EXTS
        )
        if not self.images:
            raise FileNotFoundError(f"no images under {img_dir}")
        self.nc = self.spec["nc"]
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def close_mosaic(self) -> None:
        self.hyp["mosaic"] = 0.0

    def __len__(self) -> int:
        return len(self.images)

    # ------------------------------------------------------------- loading
    def _load_raw(self, idx: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """image uint8 RGB, boxes xyxy pixels, labels."""
        path = self.images[idx]
        img = cv2.imread(str(path))
        if img is None:
            img = np.full((self.imgsz, self.imgsz, 3), 114, np.uint8)
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        rows = read_yolo_labels(_label_path(path))
        labels = rows[:, 0].astype(np.int32)
        cxcywh = rows[:, 1:5] * [w, h, w, h]
        boxes = np.concatenate(
            [cxcywh[:, :2] - cxcywh[:, 2:] / 2, cxcywh[:, :2] + cxcywh[:, 2:] / 2],
            axis=1,
        ).astype(np.float32)
        return img, boxes, labels

    def _mosaic(
        self, idx: int, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """4-image mosaic on a 2S x 2S canvas, center jittered."""
        s = self.imgsz
        canvas = np.full((2 * s, 2 * s, 3), 114, np.uint8)
        cx = int(rng.uniform(0.5 * s, 1.5 * s))
        cy = int(rng.uniform(0.5 * s, 1.5 * s))
        idxs = [idx] + list(rng.integers(0, len(self.images), 3))
        all_boxes, all_labels = [], []
        for i, im_idx in enumerate(idxs):
            img, boxes, labels = self._load_raw(int(im_idx))
            h, w = img.shape[:2]
            gain = min(s / h, s / w)
            img = cv2.resize(
                img, (int(w * gain), int(h * gain)), interpolation=cv2.INTER_LINEAR
            )
            h, w = img.shape[:2]
            if i == 0:  # top-left quadrant, bottom-right corner at (cx, cy)
                x1, y1 = max(cx - w, 0), max(cy - h, 0)
                x2, y2 = cx, cy
                sx1, sy1 = w - (x2 - x1), h - (y2 - y1)
            elif i == 1:  # top-right
                x1, y1 = cx, max(cy - h, 0)
                x2, y2 = min(cx + w, 2 * s), cy
                sx1, sy1 = 0, h - (y2 - y1)
            elif i == 2:  # bottom-left
                x1, y1 = max(cx - w, 0), cy
                x2, y2 = cx, min(cy + h, 2 * s)
                sx1, sy1 = w - (x2 - x1), 0
            else:  # bottom-right
                x1, y1 = cx, cy
                x2, y2 = min(cx + w, 2 * s), min(cy + h, 2 * s)
                sx1, sy1 = 0, 0
            canvas[y1:y2, x1:x2] = img[sy1 : sy1 + (y2 - y1), sx1 : sx1 + (x2 - x1)]
            if len(boxes):
                b = boxes * gain
                b[:, [0, 2]] += x1 - sx1
                b[:, [1, 3]] += y1 - sy1
                all_boxes.append(b)
                all_labels.append(labels)
        boxes = (
            np.concatenate(all_boxes).astype(np.float32)
            if all_boxes
            else np.zeros((0, 4), np.float32)
        )
        labels = (
            np.concatenate(all_labels) if all_labels else np.zeros((0,), np.int32)
        )
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
        return canvas, boxes, labels

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self._epoch * 7919 + idx) % (2**31)
        )
        hyp = self.hyp
        if self.augment and rng.uniform() < hyp["mosaic"]:
            img, boxes, labels = self._mosaic(idx, rng)
            img, boxes, labels = random_affine(
                img, boxes, labels, rng, self.imgsz,
                hyp["degrees"], hyp["translate"], hyp["scale"],
            )
        else:
            img, boxes, labels = self._load_raw(idx)
            img, gain, (px, py) = letterbox_np(img, self.imgsz)
            if len(boxes):
                boxes = boxes * gain + [px, py, px, py]
        if self.augment:
            img = hsv_jitter(img, rng, hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"])
            if any(hyp.get(k, 0) for k in ("noise", "blur", "jpeg", "distort", "erasing")):
                from kuzu.data.augment_extra import apply_photometric

                img = apply_photometric(
                    img, rng,
                    p_noise=hyp["noise"], p_blur=hyp["blur"], p_jpeg=hyp["jpeg"],
                    p_distort=hyp["distort"], p_dropout=hyp["erasing"],
                )
            if rng.uniform() < hyp["fliplr"]:
                img = img[:, ::-1]
                if len(boxes):
                    boxes[:, [0, 2]] = self.imgsz - boxes[:, [2, 0]]
            if rng.uniform() < hyp["flipud"]:
                img = img[::-1]
                if len(boxes):
                    boxes[:, [1, 3]] = self.imgsz - boxes[:, [3, 1]]

        m = self.max_boxes
        out_boxes = np.zeros((m, 4), np.float32)
        out_labels = np.zeros((m,), np.int32)
        n = min(len(boxes), m)
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = labels[:n]
        mask = np.zeros((m,), bool)
        mask[:n] = True
        return {
            "image": np.ascontiguousarray(img, np.uint8).astype(np.float32) / 255.0,
            "gt_boxes": out_boxes,
            "gt_labels": out_labels,
            "mask_gt": mask,
        }
