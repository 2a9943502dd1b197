"""Photometric / structural augmentations beyond the v8 core set.

Capability parity with the project's Albumentations pipeline
(``src/utils/augmentation.py:50-99``): GaussNoise, MotionBlur, JPEG
compression artifacts, GridDistortion, CoarseDropout — implemented on
numpy/cv2 (host-side, thread-overlapped with device compute). Each takes an
RGB uint8 image and an ``np.random.Generator`` and returns uint8.
"""

from __future__ import annotations

import numpy as np


def gauss_noise(img: np.ndarray, rng: np.random.Generator, sigma: float = 12.0) -> np.ndarray:
    noise = rng.normal(0, sigma, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def motion_blur(img: np.ndarray, rng: np.random.Generator, max_ksize: int = 7) -> np.ndarray:
    import cv2

    k = int(rng.integers(3, max_ksize + 1)) | 1  # odd
    kernel = np.zeros((k, k), np.float32)
    if rng.random() < 0.5:
        kernel[k // 2, :] = 1.0 / k  # horizontal streak
    else:
        kernel[:, k // 2] = 1.0 / k  # vertical
    return cv2.filter2D(img, -1, kernel)


def jpeg_compression(img: np.ndarray, rng: np.random.Generator, quality_range=(40, 90)) -> np.ndarray:
    import cv2

    q = int(rng.integers(*quality_range))
    ok, enc = cv2.imencode(".jpg", img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, q])
    if not ok:
        return img
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[..., ::-1]


def grid_distortion(
    img: np.ndarray, rng: np.random.Generator, num_steps: int = 5, distort: float = 0.3
) -> np.ndarray:
    """Piecewise-smooth warp over a grid (text-safe small distortions)."""
    import cv2

    h, w = img.shape[:2]
    xs = np.linspace(0, w, num_steps + 1)
    ys = np.linspace(0, h, num_steps + 1)
    jx = xs + rng.uniform(-distort, distort, xs.shape) * (w / num_steps)
    jy = ys + rng.uniform(-distort, distort, ys.shape) * (h / num_steps)
    jx[0], jx[-1], jy[0], jy[-1] = 0, w, 0, h
    map_x = np.interp(np.arange(w), xs, jx).astype(np.float32)
    map_y = np.interp(np.arange(h), ys, jy).astype(np.float32)
    grid_x = np.tile(map_x, (h, 1))
    grid_y = np.tile(map_y[:, None], (1, w))
    return cv2.remap(img, grid_x, grid_y, cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def coarse_dropout(
    img: np.ndarray,
    rng: np.random.Generator,
    max_holes: int = 8,
    max_frac: float = 0.08,
    fill: int = 114,
) -> np.ndarray:
    out = img.copy()
    h, w = img.shape[:2]
    for _ in range(int(rng.integers(1, max_holes + 1))):
        hw = int(rng.uniform(0.02, max_frac) * w)
        hh = int(rng.uniform(0.02, max_frac) * h)
        x = int(rng.integers(0, max(w - hw, 1)))
        y = int(rng.integers(0, max(h - hh, 1)))
        out[y : y + hh, x : x + hw] = fill
    return out


def apply_photometric(
    img: np.ndarray,
    rng: np.random.Generator,
    p_noise: float = 0.0,
    p_blur: float = 0.0,
    p_jpeg: float = 0.0,
    p_distort: float = 0.0,
    p_dropout: float = 0.0,
) -> np.ndarray:
    """Compose the extra augmentations with per-op probabilities."""
    if p_noise and rng.random() < p_noise:
        img = gauss_noise(img, rng)
    if p_blur and rng.random() < p_blur:
        img = motion_blur(img, rng)
    if p_jpeg and rng.random() < p_jpeg:
        img = jpeg_compression(img, rng)
    if p_distort and rng.random() < p_distort:
        img = grid_distortion(img, rng)
    if p_dropout and rng.random() < p_dropout:
        img = coarse_dropout(img, rng)
    return img
