"""Image normalization tools: uniform-width padding + dataset channel stats.

Parity with ``padding_data.py`` (P21 — pad column crops to uniform width with
an Otsu-estimated background color, parallel) and
``scripts/calc_dataset_mean_and_std.py`` (P22 — channel mean/std over a
dataset; known kuzushiji stats recorded in
``kuzu.ops.letterbox.KUZUSHIJI_MEAN/STD``).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def estimate_background(img: np.ndarray) -> tuple[int, int, int]:
    """Background color via Otsu threshold on grayscale: mean of the
    brighter class (paper)."""
    import cv2

    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    thr, _ = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    mask = gray >= thr
    if mask.sum() == 0:
        return (255, 255, 255)
    bg = img[mask].mean(axis=0)
    return tuple(int(c) for c in bg)


def pad_to_width(img: np.ndarray, target_w: int) -> np.ndarray:
    """Center-pad an RGB image to target width with the estimated background."""
    h, w = img.shape[:2]
    if w >= target_w:
        return img
    bg = estimate_background(img)
    canvas = np.full((h, target_w, 3), bg, np.uint8)
    x0 = (target_w - w) // 2
    canvas[:, x0 : x0 + w] = img
    return canvas


def pad_dataset(
    src_dir: str | Path, out_dir: str | Path, target_w: int | None = None,
    workers: int = 4,
) -> int:
    """Pad every image under src_dir to uniform width. Returns count."""
    import cv2

    src_dir, out_dir = Path(src_dir), Path(out_dir)
    paths = [p for p in sorted(src_dir.rglob("*")) if p.suffix.lower() in IMG_EXTS]
    if not paths:
        return 0
    if target_w is None:
        widths = []
        for p in paths:
            im = cv2.imread(str(p))
            if im is not None:
                widths.append(im.shape[1])
        target_w = int(max(widths))

    def work(p: Path) -> bool:
        im = cv2.imread(str(p))
        if im is None:
            return False
        rgb = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        out = pad_to_width(rgb, target_w)
        dst = out_dir / p.relative_to(src_dir)
        dst.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(dst), cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        return True

    with ThreadPoolExecutor(workers) as pool:
        return sum(pool.map(work, paths))


def dataset_mean_std(
    root: str | Path, max_images: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Streaming per-channel mean/std over all images (values in [0,1])."""
    import cv2

    count = 0
    s1 = np.zeros(3, np.float64)
    s2 = np.zeros(3, np.float64)
    n_px = 0
    for p in sorted(Path(root).rglob("*")):
        if p.suffix.lower() not in IMG_EXTS:
            continue
        im = cv2.imread(str(p))
        if im is None:
            continue
        arr = cv2.cvtColor(im, cv2.COLOR_BGR2RGB).astype(np.float64) / 255.0
        s1 += arr.sum(axis=(0, 1))
        s2 += (arr**2).sum(axis=(0, 1))
        n_px += arr.shape[0] * arr.shape[1]
        count += 1
        if max_images and count >= max_images:
            break
    if n_px == 0:
        raise FileNotFoundError(f"no images under {root}")
    mean = s1 / n_px
    std = np.sqrt(np.maximum(s2 / n_px - mean**2, 1e-12))
    return mean, std
