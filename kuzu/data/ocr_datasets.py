"""OCR dataset readers: column_info.csv + per-book one-line layouts.

Capability parity with the reference's three recognizer datasets:
- ``TrOCRDataset`` (``src/data/trocr_dataset.py:56-204``): column_info.csv
  with ``column_image`` paths and ``unicode_ids`` ('U+XXXX ...') labels,
  in-file 80/10/10 split, aspect-preserving letterbox to (1024, 64) with
  white fill, char tokenization to max_length=128;
- ``OneLineOCRDataset`` (``src/data/oneline_dataset.py:12-229``):
  ``{split}/{images,labels}/{book}/*`` per-book dirs, txt labels;
- ``OCRDataset`` (``scripts/data_loader.py:16-170``): same layout plus
  ``bounding_boxes/{book}/*.json`` char boxes and a vocab built from labels.

All emit fixed-shape samples: image (H, W, C) float32 in [0,1] (normalized),
tokens (L,) int32 BOS...EOS pad, length scalar. Corrupt images fall back to
blank canvases (reference behavior).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image, ImageFile

from kuzu.data.tokenizer import CharTokenizer, decode_unicode_ids

ImageFile.LOAD_TRUNCATED_IMAGES = True  # reference src/data/dataset.py:19

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def load_letterboxed(
    path: str | Path,
    out_h: int,
    out_w: int,
    fill: int = 255,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """PIL load -> aspect resize -> top-left paste on fill canvas -> uint8.

    ``path`` may be a pre-decoded ``PIL.Image`` (RGB) — datasets pass cached
    decodes through (``cache_images='ram'``).

    Host-side analogue of ``ResizeWithPadding`` (trocr_dataset.py:12-53):
    content anchored at origin, white fill. Returns RAW uint8 pixels — the
    models normalize on-device (``kuzu.ops.images.from_uint8``), which cuts
    the host->device transfer 4x (and the tunnel client's per-transfer host
    retention with it). With ``rng``, applies the *geometric* train-time
    jitter (scale + small paste offset); photometric jitter moved on-device
    (``kuzu.ops.images.photometric_aug`` in the recognize loss) where it is
    fused VPU work instead of per-sample numpy on a 1-core host.
    """
    try:
        img = (
            path
            if isinstance(path, Image.Image)
            else Image.open(path).convert("RGB")
        )
        w, h = img.size
        gain = min(out_h / h, out_w / w)
        ox = oy = 0
        if rng is not None:
            gain *= float(rng.uniform(0.82, 1.0))
            nw, nh = max(int(round(w * gain)), 1), max(int(round(h * gain)), 1)
            ox = int(rng.integers(0, max(out_w - nw, 0) + 1))
            oy = int(rng.integers(0, min(max(out_h - nh, 0), 12) + 1))
        nw, nh = max(int(round(w * gain)), 1), max(int(round(h * gain)), 1)
        img = img.resize((nw, nh), Image.BILINEAR)
        canvas = Image.new("RGB", (out_w, out_h), (fill,) * 3)
        canvas.paste(img, (ox, oy))
        arr = np.asarray(canvas, np.uint8)
    except Exception:
        arr = np.full((out_h, out_w, 3), fill, np.uint8)
    return arr


class ColumnInfoDataset:
    """column_info.csv reader with deterministic in-file split."""

    def __init__(
        self,
        csv_path: str | Path,
        tokenizer: CharTokenizer,
        split: str = "train",
        image_size: tuple[int, int] = (1024, 64),
        max_length: int = 128,
        image_root: str | Path | None = None,
        split_fracs: tuple[float, float] = (0.8, 0.1),  # train, val (rest test)
        augment: bool = False,
        seed: int = 0,
        cache_images: str | None = None,  # 'ram': decode each column once
    ):
        import pandas as pd

        self.cache_images = cache_images if cache_images == "ram" else None

        self.csv_path = Path(csv_path)
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.max_length = max_length
        self.image_root = Path(image_root) if image_root else self.csv_path.parent
        self.augment = augment
        self.seed = seed
        self._epoch = 0

        df = pd.read_csv(self.csv_path)
        texts = [decode_unicode_ids(u) for u in df["unicode_ids"].astype(str)]
        paths = [self._resolve(p) for p in df["column_image"].astype(str)]
        n = len(df)
        n_train = int(n * split_fracs[0])
        n_val = int(n * split_fracs[1])
        sl = {
            "train": slice(0, n_train),
            "val": slice(n_train, n_train + n_val),
            "test": slice(n_train + n_val, n),
        }[split]
        self.items = list(zip(paths[sl], texts[sl]))
        self._img_cache: list | None = (
            [None] * len(self.items) if self.cache_images else None
        )

    def _source(self, idx: int):
        """Image source for one item: the path, or a cached decode."""
        path = self.items[idx][0]
        if self._img_cache is None:
            return path
        img = self._img_cache[idx]
        if img is None:
            try:
                img = Image.open(path).convert("RGB")
            except OSError:
                return path  # load_letterboxed emits its blank fallback
            self._img_cache[idx] = img  # atomic list store under the GIL
        return img

    def _resolve(self, p: str) -> Path:
        q = Path(p)
        return q if q.is_absolute() else self.image_root / q

    def texts(self) -> list[str]:
        return [t for _, t in self.items]

    def __len__(self) -> int:
        return len(self.items)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        _, text = self.items[idx]
        rng = (
            np.random.default_rng(
                (self.seed * 1_000_003 + self._epoch * 7919 + idx) % (2**31)
            )
            if self.augment
            else None
        )
        image = load_letterboxed(self._source(idx), *self.image_size, rng=rng)
        tokens = self.tokenizer.encode(text, max_length=self.max_length)
        length = int((tokens != self.tokenizer.pad_id).sum())
        return {
            "image": image,
            "tokens": tokens,
            "length": np.int32(length),
        }


class OneLineDataset:
    """{split}/{images,labels[,bounding_boxes]}/{book}/* reader."""

    def __init__(
        self,
        root: str | Path,
        tokenizer: CharTokenizer | None,
        split: str = "train",
        image_size: tuple[int, int] = (1024, 64),
        max_length: int = 128,
        with_boxes: bool = False,
        max_boxes: int = 64,
        augment: bool = False,
        seed: int = 0,
    ):
        self.root = Path(root) / split
        self.tokenizer = tokenizer
        self.image_size = image_size
        self.max_length = max_length
        self.with_boxes = with_boxes
        self.max_boxes = max_boxes
        # geometric jitter would desync the letterboxed pixel boxes, so
        # augmentation is gated off whenever boxes ride along
        self.augment = augment and not with_boxes
        self.seed = seed
        self._epoch = 0

        img_root = self.root / "images"
        lbl_root = self.root / "labels"
        self.items: list[tuple[Path, str, Path | None]] = []
        # per-book subdirs or flat
        img_dirs = (
            [d for d in sorted(img_root.iterdir()) if d.is_dir()] or [img_root]
            if img_root.exists()
            else []
        )
        for d in img_dirs:
            book = d.name if d != img_root else ""
            for img in sorted(d.iterdir()):
                if img.suffix.lower() not in IMG_EXTS:
                    continue
                lbl = lbl_root / book / (img.stem + ".txt")
                if not lbl.exists():
                    continue
                text = lbl.read_text(encoding="utf-8").strip()
                bbox = None
                if with_boxes:
                    cand = self.root / "bounding_boxes" / book / (img.stem + ".json")
                    bbox = cand if cand.exists() else None
                self.items.append((img, text, bbox))

    def texts(self) -> list[str]:
        return [t for _, t, _ in self.items]

    def __len__(self) -> int:
        return len(self.items)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        path, text, bbox_path = self.items[idx]
        rng = (
            np.random.default_rng(
                (self.seed * 1_000_003 + self._epoch * 7919 + idx) % (2**31)
            )
            if self.augment
            else None
        )
        image = load_letterboxed(path, *self.image_size, rng=rng)
        out: dict[str, np.ndarray] = {"image": image}
        if self.tokenizer is not None:
            tokens = self.tokenizer.encode(text, max_length=self.max_length)
            out["tokens"] = tokens
            out["length"] = np.int32((tokens != self.tokenizer.pad_id).sum())
        if self.with_boxes:
            boxes = np.zeros((self.max_boxes, 4), np.float32)
            n = 0
            if bbox_path is not None:
                try:
                    raw = json.loads(Path(bbox_path).read_text())
                    arr = np.asarray(raw, np.float32).reshape(-1, 4)[: self.max_boxes]
                    boxes[: len(arr)] = arr
                    n = len(arr)
                except Exception:
                    pass
            out["boxes"] = boxes
            out["num_boxes"] = np.int32(n)
        return out


def build_tokenizer_from_datasets(*datasets, min_freq: int = 1) -> CharTokenizer:
    texts: list[str] = []
    for ds in datasets:
        texts.extend(ds.texts())
    return CharTokenizer.train(texts, min_freq=min_freq)
