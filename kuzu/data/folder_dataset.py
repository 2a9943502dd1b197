"""Image-folder-per-class glyph dataset.

Parity with the reference's ``CharUnicodeDataset``
(``scripts/train_simplevit_char.py:43-106``): ``root/U+XXXX/*.jpg`` layout,
unicode-directory -> class-index map, square resize, optional grayscale,
corrupt images replaced by zeros (the reference's dummy-tensor fallback).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


class GlyphFolderDataset:
    def __init__(
        self,
        root: str | Path,
        image_size: int = 128,
        channels: int = 1,
        class_map: dict[str, int] | None = None,
    ):
        self.root = Path(root)
        self.image_size = image_size
        self.channels = channels
        dirs = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_map = class_map or {name: i for i, name in enumerate(dirs)}
        self.samples: list[tuple[Path, int]] = []
        for name in dirs:
            if name not in self.class_map:
                continue
            label = self.class_map[name]
            for p in sorted((self.root / name).iterdir()):
                if p.suffix.lower() in IMG_EXTS:
                    self.samples.append((p, label))

    @property
    def num_classes(self) -> int:
        return len(self.class_map)

    def save_class_map(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.class_map, ensure_ascii=False))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        path, label = self.samples[idx]
        s = self.image_size
        try:
            img = Image.open(path)
            img = img.convert("L" if self.channels == 1 else "RGB")
            img = img.resize((s, s), Image.BILINEAR)
            arr = np.asarray(img, dtype=np.uint8)  # models /255 on-device
            if self.channels == 1:
                arr = arr[..., None]
        except Exception:
            arr = np.zeros((s, s, self.channels), np.uint8)
        return {"image": arr, "label": np.int32(label)}
