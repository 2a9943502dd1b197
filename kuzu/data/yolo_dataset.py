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
    out = {
        "root": root,
        "train": d.get("train", "images/train"),
        "val": d.get("val", "images/val"),
        "names": {int(k): v for k, v in names.items()},
        "nc": int(d.get("nc", len(names) or 1)),
    }
    # task extras pass through (pose kpt_shape/flip_idx, segment options)
    for k in ("kpt_shape", "flip_idx", "test"):
        if k in d:
            out[k] = d[k]
    return out


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
    img: np.ndarray, size: int | tuple[int, int], fill: int = 114
) -> tuple[np.ndarray, float, tuple[float, float]]:
    """cv2 letterbox to (size, size) or rectangular (h, w);
    returns (canvas, gain, (pad_x, pad_y))."""
    th, tw = (size, size) if isinstance(size, int) else (int(size[0]), int(size[1]))
    h, w = img.shape[:2]
    gain = min(th / h, tw / w)
    nw, nh = max(int(round(w * gain)), 1), max(int(round(h * gain)), 1)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((th, tw, 3), fill, np.uint8)
    px, py = (tw - nw) // 2, (th - nh) // 2
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
    shear: float = 0.0,
    perspective: float = 0.0,
    fill: int = 114,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random perspective/rotate/scale/shear/translate with box rewrite and
    degenerate filtering — full ``RandomPerspective`` semantics
    (reference ``data/augment.py:952``: M = T @ S @ R @ P @ C, warpPerspective
    when perspective != 0, box candidates filter)."""
    import math

    h, w = img.shape[:2]
    C = np.eye(3)
    C[0, 2], C[1, 2] = -w / 2, -h / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R = np.eye(3)
    R[:2] = cv2.getRotationMatrix2D((0.0, 0.0), a, s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * size
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * size
    M = T @ S @ R @ P @ C
    if perspective:
        out = cv2.warpPerspective(img, M, (size, size), borderValue=(fill,) * 3)
    else:
        out = cv2.warpAffine(img, M[:2], (size, size), borderValue=(fill,) * 3)
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
    warped = np.concatenate([corners, ones], 1) @ M.T  # (4N, 3)
    if perspective:
        warped = warped[:, :2] / np.maximum(warped[:, 2:3], 1e-9)
    else:
        warped = warped[:, :2]
    warped = warped.reshape(4, -1, 2)
    new = np.concatenate(
        [warped.min(axis=0), warped.max(axis=0)], axis=1
    ).astype(np.float32)
    new[:, [0, 2]] = new[:, [0, 2]].clip(0, size)
    new[:, [1, 3]] = new[:, [1, 3]].clip(0, size)
    # box candidates filter (reference box_candidates: wh > 2px, aspect
    # ratio < 100, area ratio > 0.1)
    wh = new[:, 2:] - new[:, :2]
    old_wh = (boxes[:, 2:] - boxes[:, :2]) * s
    ar = np.maximum(
        wh[:, 0] / np.maximum(wh[:, 1], 1e-9),
        wh[:, 1] / np.maximum(wh[:, 0], 1e-9),
    )
    keep = (
        (wh > 2).all(1)
        & (wh.prod(1) / np.maximum(old_wh.prod(1), 1e-6) > 0.1)
        & (ar < 100)
    )
    return out, new[keep], labels[keep]


def mixup(
    img1: np.ndarray, boxes1: np.ndarray, labels1: np.ndarray,
    img2: np.ndarray, boxes2: np.ndarray, labels2: np.ndarray,
    rng: np.random.Generator,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Beta(32, 32) image blend with concatenated targets (reference
    ``MixUp.__call__``, ``data/augment.py:867``)."""
    r = rng.beta(32.0, 32.0)
    img = (
        img1.astype(np.float32) * r + img2.astype(np.float32) * (1.0 - r)
    ).astype(np.uint8)
    boxes = np.concatenate([boxes1, boxes2]).astype(np.float32)
    labels = np.concatenate([labels1, labels2]).astype(labels1.dtype)
    return img, boxes, labels


def copy_paste(
    img: np.ndarray,
    boxes: np.ndarray,  # (N, 4) xyxy pixels
    labels: np.ndarray,
    rng: np.random.Generator,
    p: float = 0.5,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flip-mode copy-paste: duplicate a fraction ``p`` of instances at the
    horizontally-mirrored position when the mirrored box overlaps existing
    instances by IoA < 0.30 (reference ``CopyPaste``,
    ``data/augment.py:1634`` — segments replaced by box patches since
    kuzushiji labels carry no polygons)."""
    n = len(boxes)
    if n == 0 or p <= 0:
        return img, boxes, labels
    h, w = img.shape[:2]
    k = max(int(round(p * n)), 1)
    out = img.copy()
    new_boxes, new_labels = [], []
    all_boxes = boxes
    for i in rng.permutation(n)[:k]:
        x1, y1, x2, y2 = boxes[i]
        mx1, mx2 = w - x2, w - x1  # mirrored x-range
        cand = np.array([mx1, y1, mx2, y2], np.float32)
        # intersection-over-area vs every existing box
        ix1 = np.maximum(all_boxes[:, 0], cand[0])
        iy1 = np.maximum(all_boxes[:, 1], cand[1])
        ix2 = np.minimum(all_boxes[:, 2], cand[2])
        iy2 = np.minimum(all_boxes[:, 3], cand[3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        area = max((cand[2] - cand[0]) * (cand[3] - cand[1]), 1e-6)
        if len(all_boxes) and (inter / area).max() >= 0.30:
            continue
        sy1, sy2 = int(y1), int(y2)
        sx1, sx2 = int(x1), int(x2)
        dx1, dx2 = int(mx1), int(mx1) + (sx2 - sx1)
        if sy2 <= sy1 or sx2 <= sx1 or dx2 > w or dx1 < 0:
            continue
        out[sy1:sy2, dx1:dx2] = img[sy1:sy2, sx1:sx2][:, ::-1]
        new_boxes.append(cand)
        new_labels.append(labels[i])
        all_boxes = np.concatenate([all_boxes, cand[None]])
    if new_boxes:
        boxes = np.concatenate([boxes, np.stack(new_boxes)]).astype(np.float32)
        labels = np.concatenate([labels, np.asarray(new_labels, labels.dtype)])
    return out, boxes, labels


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
        rect: bool = False,
        stride: int = 32,
        cache: bool = True,
        cache_images: str | None = None,  # 'ram' | 'disk' | None
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
            "shear": 0.0,
            "perspective": 0.0,
            "mixup": 0.0,
            "copy_paste": 0.0,
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
        # rect mode: per-image target shapes quantized to stride multiples —
        # tall pages letterbox into (imgsz, short) canvases instead of
        # squares (reference BaseDataset rect, ``data/base.py``). Shapes
        # quantize to the stride grid, so a book of same-aspect pages lands
        # in ONE static shape bucket (one XLA program, far less padding).
        self.rect = rect and not self.augment
        self.stride = stride
        self._rect_shapes: list[tuple[int, int]] | None = None
        if self.rect:
            self._rect_shapes = [
                self._bucket_shape(p) for p in self.images
            ]
        # label cache: one-time parse of every label txt, persisted next to
        # the labels dir and invalidated by an mtime/size hash (reference
        # ``data/dataset.py::cache_labels`` / ``get_labels``, labels.cache)
        self._labels: list[np.ndarray] | None = (
            self._load_label_cache() if cache else None
        )
        # image cache (reference ``cache=ram|disk``, data/base.py
        # cache_images): JPEG decode dominates the sample cost (measured
        # ~11 ms of 24 ms/sample at flagship scale) and mosaic touches 4
        # images per sample — decode each image ONCE. 'ram' keeps decoded
        # RGB arrays in memory (lazy, thread-safe under the GIL); 'disk'
        # persists .npy siblings so the decode survives processes.
        self.cache_images = cache_images if cache_images in ("ram", "disk") else None
        self._img_cache: list | None = (
            [None] * len(self.images) if self.cache_images == "ram" else None
        )
        if self.cache_images == "ram":
            sample = cv2.imread(str(self.images[0]))
            if sample is not None:
                est = sample.nbytes * len(self.images) / 1e9
                if est > 4.0:
                    import logging

                    logging.getLogger("kuzu").warning(
                        f"cache_images=ram: ~{est:.1f} GB of decoded images"
                    )

    def _label_cache_file(self) -> Path:
        # deterministic home: the first image's labels dir (images sorted)
        return _label_path(self.images[0]).parent / "labels.cache.npz"

    def _load_label_cache(self) -> list[np.ndarray] | None:
        """All (N_i, 5) normalized label rows, via the on-disk cache when
        its hash still matches the label files."""
        import hashlib

        paths = [_label_path(p) for p in self.images]
        h = hashlib.sha1()
        for p in paths:
            st = p.stat() if p.exists() else None
            h.update(
                f"{p.name}:{st.st_mtime_ns if st else 0}:"
                f"{st.st_size if st else -1};".encode()
            )
        key = h.hexdigest()
        cache_file = self._label_cache_file()
        try:
            z = np.load(cache_file, allow_pickle=False)
            if str(z["key"]) == key:
                rows, counts = z["rows"], z["counts"]
                off = np.concatenate([[0], np.cumsum(counts)])
                return [
                    rows[off[i]:off[i + 1]].astype(np.float32)
                    for i in range(len(counts))
                ]
        except (OSError, KeyError, ValueError):
            pass
        labels = [read_yolo_labels(p) for p in paths]
        try:
            cache_file.parent.mkdir(parents=True, exist_ok=True)
            np.savez(
                cache_file,
                key=key,
                rows=(
                    np.concatenate(labels)
                    if labels
                    else np.zeros((0, 5), np.float32)
                ),
                counts=np.asarray([len(l) for l in labels], np.int64),
            )
        except OSError:
            pass  # read-only dataset dir: keep the in-memory cache only
        return labels

    def _bucket_shape(self, path: Path) -> tuple[int, int]:
        """Target (h, w) for one image: long side = imgsz, short side
        rounded UP to a stride multiple (boxes never crop)."""
        from PIL import Image

        with Image.open(path) as im:
            w, h = im.size
        s, st = self.imgsz, self.stride
        if h >= w:
            short = min(-(-int(s * w / h) // st) * st, s)
            return (s, max(short, st))
        short = min(-(-int(s * h / w) // st) * st, s)
        return (max(short, st), s)

    def batch_shape_key(self, idx: int) -> tuple[int, int]:
        """Grouping key for the loader: images sharing a rect bucket batch
        together (aspect-grouped batching)."""
        if self._rect_shapes is None:
            return (self.imgsz, self.imgsz)
        return self._rect_shapes[idx]

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _mosaic_affine(
        self, idx: int, rng: np.random.Generator
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        hyp = self.hyp
        img, boxes, labels = self._mosaic(idx, rng)
        return random_affine(
            img, boxes, labels, rng, self.imgsz,
            hyp["degrees"], hyp["translate"], hyp["scale"],
            hyp["shear"], hyp["perspective"],
        )

    def close_mosaic(self) -> None:
        self.hyp["mosaic"] = 0.0

    def __len__(self) -> int:
        return len(self.images)

    # ------------------------------------------------------------- loading
    def _decode(self, idx: int) -> np.ndarray:
        """Decoded uint8 RGB for one image, through the configured cache."""
        path = self.images[idx]
        if self._img_cache is not None:  # ram
            img = self._img_cache[idx]
            if img is not None:
                return img
        elif self.cache_images == "disk":
            npy = path.with_suffix(".cache.npy")
            if npy.exists():
                try:
                    return np.load(npy, allow_pickle=False)
                except (OSError, ValueError):
                    pass
        img = cv2.imread(str(path))
        if img is None:
            img = np.full((self.imgsz, self.imgsz, 3), 114, np.uint8)
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self._img_cache is not None:
            self._img_cache[idx] = img  # atomic list store under the GIL
        elif self.cache_images == "disk":
            try:
                np.save(path.with_suffix(".cache.npy"), img)
            except OSError:
                pass  # read-only dataset dir
        return img

    def _load_raw(self, idx: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """image uint8 RGB, boxes xyxy pixels, labels."""
        path = self.images[idx]
        img = self._decode(idx)
        h, w = img.shape[:2]
        rows = (
            self._labels[idx]
            if self._labels is not None
            else read_yolo_labels(_label_path(path))
        )
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
            img, boxes, labels = self._mosaic_affine(idx, rng)
            if rng.uniform() < hyp["mixup"]:
                # MixUp blends two mosaic outputs (reference pre_transform)
                idx2 = int(rng.integers(0, len(self.images)))
                img2, boxes2, labels2 = self._mosaic_affine(idx2, rng)
                img, boxes, labels = mixup(
                    img, boxes, labels, img2, boxes2, labels2, rng
                )
        else:
            img, boxes, labels = self._load_raw(idx)
            target = (
                self._rect_shapes[idx] if self._rect_shapes is not None
                else self.imgsz
            )
            img, gain, (px, py) = letterbox_np(img, target)
            if len(boxes):
                boxes = boxes * gain + [px, py, px, py]
        if self.augment:
            if hyp["copy_paste"] > 0:
                img, boxes, labels = copy_paste(
                    img, boxes, labels, rng, p=hyp["copy_paste"]
                )
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
                    boxes[:, [0, 2]] = img.shape[1] - boxes[:, [2, 0]]
            if rng.uniform() < hyp["flipud"]:
                img = img[::-1]
                if len(boxes):
                    boxes[:, [1, 3]] = img.shape[0] - boxes[:, [3, 1]]

        m = self.max_boxes
        out_boxes = np.zeros((m, 4), np.float32)
        out_labels = np.zeros((m,), np.int32)
        n = min(len(boxes), m)
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = labels[:n]
        mask = np.zeros((m,), bool)
        mask[:n] = True
        return {
            "image": np.ascontiguousarray(img, np.uint8),  # models /255 on-device
            "gt_boxes": out_boxes,
            "gt_labels": out_labels,
            "mask_gt": mask,
        }


def read_yolo_segments(path: Path) -> list[tuple[int, np.ndarray]]:
    """Segment-format labels: ``cls x1 y1 x2 y2 ... xn yn`` (normalized
    polygon per instance, reference ultralytics segment datasets)."""
    if not path.exists():
        return []
    out = []
    for line in path.read_text().splitlines():
        vals = line.split()
        if len(vals) < 7:  # cls + >=3 points
            continue
        cls = int(float(vals[0]))
        pts = np.asarray(vals[1:], np.float32).reshape(-1, 2)
        out.append((cls, pts))
    return out


class YoloSegmentDataset(YoloDetectionDataset):
    """Instance-segmentation samples: polygons -> boxes + overlap-index mask.

    Emits the reference's ``overlap_mask=True`` representation: ONE
    (H/ratio, W/ratio) int32 map per image where pixel value i+1 marks
    instance i (``v8SegmentationLoss``, ``utils/loss.py:335-341``) — no
    (M, H, W) per-instance stack ever materializes.

    Geometric augmentations (mosaic/affine) are disabled for segment in this
    round — polygons transform under hsv + flips only; the detect pipeline
    keeps the full recipe.
    """

    def __init__(self, *args, mask_ratio: int = 4, **kwargs):
        kwargs.setdefault("cache", False)  # polygon rows aren't (cls, xywh)
        super().__init__(*args, **kwargs)
        self.mask_ratio = mask_ratio
        self.hyp["mosaic"] = 0.0

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self._epoch * 7919 + idx) % (2**31)
        )
        path = self.images[idx]
        img = cv2.imread(str(path))
        img = (
            np.full((self.imgsz, self.imgsz, 3), 114, np.uint8)
            if img is None
            else cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        )
        h, w = img.shape[:2]
        segs = read_yolo_segments(_label_path(path))
        polys = [pts * [w, h] for _, pts in segs]
        labels = np.asarray([c for c, _ in segs], np.int32)

        img, gain, (px, py) = letterbox_np(img, self.imgsz)
        polys = [p * gain + [px, py] for p in polys]
        if self.augment:
            img = hsv_jitter(
                img, rng, self.hyp["hsv_h"], self.hyp["hsv_s"], self.hyp["hsv_v"]
            )
            if rng.uniform() < self.hyp["fliplr"]:
                img = img[:, ::-1]
                polys = [
                    np.stack([img.shape[1] - p[:, 0], p[:, 1]], 1) for p in polys
                ]
            if rng.uniform() < self.hyp["flipud"]:
                img = img[::-1]
                polys = [
                    np.stack([p[:, 0], img.shape[0] - p[:, 1]], 1) for p in polys
                ]

        boxes = np.asarray(
            [
                [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]
                for p in polys
            ],
            np.float32,
        ).reshape(-1, 4)

        mh = img.shape[0] // self.mask_ratio
        mw = img.shape[1] // self.mask_ratio
        mask = np.zeros((mh, mw), np.int32)
        for i, p in enumerate(polys[: self.max_boxes]):
            cv2.fillPoly(
                mask,
                [(p / self.mask_ratio).astype(np.int32)],
                color=int(i + 1),
            )

        m = self.max_boxes
        out_boxes = np.zeros((m, 4), np.float32)
        out_labels = np.zeros((m,), np.int32)
        n = min(len(boxes), m)
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = labels[:n]
        vmask = np.zeros((m,), bool)
        vmask[:n] = True
        return {
            "image": np.ascontiguousarray(img, np.uint8),  # models /255 on-device
            "gt_boxes": out_boxes,
            "gt_labels": out_labels,
            "mask_gt": vmask,
            "masks": mask,
        }


class YoloPoseDataset(YoloDetectionDataset):
    """Keypoint samples: ``cls cx cy w h (x y v)*K`` rows (normalized, the
    ultralytics pose label format). Emits padded (max_boxes, K, 3) pixel
    keypoints alongside the detect fields. Geometric augmentations beyond
    flips are disabled (like segment); fliplr respects ``flip_idx`` when
    the spec provides one (left/right keypoint swaps)."""

    def __init__(self, *args, kpt_shape: tuple[int, int] = (17, 3), **kwargs):
        kwargs.setdefault("cache", False)  # kpt rows parse via _load_pose
        super().__init__(*args, **kwargs)
        self.kpt_shape = tuple(
            self.spec.get("kpt_shape", kpt_shape)
        )
        self.flip_idx = list(self.spec.get("flip_idx", []))
        self.hyp["mosaic"] = 0.0

    def _load_pose(self, idx):
        path = self.images[idx]
        img = cv2.imread(str(path))
        img = (
            np.full((self.imgsz, self.imgsz, 3), 114, np.uint8)
            if img is None
            else cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        )
        h, w = img.shape[:2]
        K, D = self.kpt_shape
        labels, boxes, kpts = [], [], []
        lp = _label_path(path)
        if lp.exists():
            for line in lp.read_text().splitlines():
                vals = np.asarray(line.split(), np.float32)
                if len(vals) != 5 + K * D:
                    continue
                labels.append(int(vals[0]))
                cx, cy, bw, bh = vals[1:5] * [w, h, w, h]
                boxes.append([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2])
                kp = vals[5:].reshape(K, D)
                kp[:, 0] *= w
                kp[:, 1] *= h
                kpts.append(kp)
        return (
            img,
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int32),
            np.asarray(kpts, np.float32).reshape(-1, K, D),
        )

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self._epoch * 7919 + idx) % (2**31)
        )
        img, boxes, labels, kpts = self._load_pose(idx)
        img, gain, (px, py) = letterbox_np(img, self.imgsz)
        if len(boxes):
            boxes = boxes * gain + [px, py, px, py]
            kpts[..., 0] = kpts[..., 0] * gain + px
            kpts[..., 1] = kpts[..., 1] * gain + py
        if self.augment:
            img = hsv_jitter(
                img, rng, self.hyp["hsv_h"], self.hyp["hsv_s"], self.hyp["hsv_v"]
            )
            if rng.uniform() < self.hyp["fliplr"]:
                img = img[:, ::-1]
                if len(boxes):
                    boxes[:, [0, 2]] = img.shape[1] - boxes[:, [2, 0]]
                    kpts[..., 0] = img.shape[1] - kpts[..., 0]
                    if self.flip_idx:
                        kpts = kpts[:, self.flip_idx]
        K, D = self.kpt_shape
        m = self.max_boxes
        out_boxes = np.zeros((m, 4), np.float32)
        out_labels = np.zeros((m,), np.int32)
        out_kpts = np.zeros((m, K, D), np.float32)
        n = min(len(boxes), m)
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = labels[:n]
        out_kpts[:n] = kpts[:n]
        vmask = np.zeros((m,), bool)
        vmask[:n] = True
        return {
            "image": np.ascontiguousarray(img, np.uint8),  # models /255 on-device
            "gt_boxes": out_boxes,
            "gt_labels": out_labels,
            "mask_gt": vmask,
            "gt_kpts": out_kpts,
        }


def read_yolo_obb(path: Path) -> tuple[np.ndarray, np.ndarray]:
    """OBB labels (DOTA/ultralytics format): ``cls x1 y1 ... x4 y4``
    normalized corner points -> (labels (N,), rboxes (N, 5) normalized
    xywhr with angle in radians)."""
    if not path.exists():
        return np.zeros((0,), np.int32), np.zeros((0, 5), np.float32)
    labels, rboxes = [], []
    for line in path.read_text().splitlines():
        vals = line.split()
        if len(vals) != 9:
            continue
        labels.append(int(float(vals[0])))
        pts = np.asarray(vals[1:], np.float32).reshape(4, 2)
        ctr = pts.mean(0)
        e1 = pts[1] - pts[0]
        e2 = pts[3] - pts[0]
        w, h = float(np.hypot(*e1)), float(np.hypot(*e2))
        r = float(np.arctan2(e1[1], e1[0]))
        # canonicalize into [-pi/4, 3pi/4) (the head's range)
        while r >= 3 * np.pi / 4:
            r -= np.pi
        while r < -np.pi / 4:
            r += np.pi
        rboxes.append([ctr[0], ctr[1], w, h, r])
    return np.asarray(labels, np.int32), np.asarray(rboxes, np.float32)


class YoloOBBDataset(YoloDetectionDataset):
    """Oriented-box samples: corner labels -> padded (max_boxes, 5) xywhr
    pixel targets. hsv-only augmentation (flips would need angle care)."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("cache", False)  # corner rows aren't (cls, xywh)
        super().__init__(*args, **kwargs)
        self.hyp["mosaic"] = 0.0

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + self._epoch * 7919 + idx) % (2**31)
        )
        path = self.images[idx]
        img = cv2.imread(str(path))
        img = (
            np.full((self.imgsz, self.imgsz, 3), 114, np.uint8)
            if img is None
            else cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        )
        h, w = img.shape[:2]
        labels, rb = read_yolo_obb(_label_path(path))
        rb = rb * [w, h, w, h, 1.0] if len(rb) else rb
        img, gain, (px, py) = letterbox_np(img, self.imgsz)
        if len(rb):
            rb = rb * [gain, gain, gain, gain, 1.0] + [px, py, 0, 0, 0]
        if self.augment:
            img = hsv_jitter(
                img, rng, self.hyp["hsv_h"], self.hyp["hsv_s"], self.hyp["hsv_v"]
            )
        m = self.max_boxes
        out_rb = np.zeros((m, 5), np.float32)
        out_labels = np.zeros((m,), np.int32)
        n = min(len(rb), m)
        out_rb[:n] = rb[:n]
        out_labels[:n] = labels[:n]
        vmask = np.zeros((m,), bool)
        vmask[:n] = True
        return {
            "image": np.ascontiguousarray(img, np.uint8),  # models /255 on-device
            "gt_rboxes": out_rb,
            "gt_labels": out_labels,
            "mask_gt": vmask,
        }
