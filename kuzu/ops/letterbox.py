"""On-device image resize / letterbox / normalize transforms (jit-able).

Capability parity with the reference's preprocessing stack —
``LetterBox`` (``yolov12/ultralytics/data/augment.py:1477``),
``ResizeWithPadding`` (``src/data/trocr_dataset.py:12-53``) and
``resize_keeping_aspect_ratio`` (``src/utils/image_processing.py:5-38``) — but
fused into XLA instead of PIL/cv2 host calls. All functions keep static output
shapes so they can live inside a jit'd serving graph; the (traced) scale/pad
metadata is returned for box rescaling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("out_h", "out_w", "method", "center"))
def letterbox(
    image: jnp.ndarray,
    out_h: int,
    out_w: int,
    fill: float = 114.0 / 255.0,
    method: str = "bilinear",
    center: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Aspect-preserving resize onto an (out_h, out_w) canvas with fill.

    Matches reference LetterBox semantics (center padding, no scale-up clamp is
    applied — callers wanting `scaleup=False` should pre-clamp). The input may
    itself be a padded canvas: pass the true content size via masking upstream.

    Returns (canvas (out_h, out_w, C), gain (scalar), pad (2,) = (pad_x, pad_y)).
    """
    h, w = image.shape[0], image.shape[1]
    gain = jnp.minimum(out_h / h, out_w / w)
    new_h = jnp.round(h * gain).astype(jnp.int32)
    new_w = jnp.round(w * gain).astype(jnp.int32)
    pad_y = ((out_h - new_h) / 2.0) if center else jnp.float32(0.0)
    pad_x = ((out_w - new_w) / 2.0) if center else jnp.float32(0.0)

    # gather-based resample with fill outside the content region: static shapes
    ys = (jnp.arange(out_h, dtype=jnp.float32) - jnp.floor(pad_y) + 0.5) / gain - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) - jnp.floor(pad_x) + 0.5) / gain - 0.5
    in_y = (ys >= -0.5) & (ys <= h - 0.5)
    in_x = (xs >= -0.5) & (xs <= w - 0.5)

    if method == "nearest":
        yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
        canvas = image[yi][:, xi]
    else:  # bilinear
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = jnp.clip(ys - y0.astype(jnp.float32), 0.0, 1.0)[:, None, None]
        wx = jnp.clip(xs - x0.astype(jnp.float32), 0.0, 1.0)[None, :, None]
        img = image.astype(jnp.float32)
        top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
        bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
        canvas = top * (1 - wy) + bot * wy

    mask = (in_y[:, None] & in_x[None, :])[..., None]
    canvas = jnp.where(mask, canvas, jnp.asarray(fill, canvas.dtype))
    return canvas.astype(jnp.float32), gain, jnp.stack([jnp.floor(pad_x), jnp.floor(pad_y)])


@partial(jax.jit, static_argnames=("out_h", "out_w", "method"))
def resize_keep_aspect(
    image: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-left anchored aspect-preserving resize (no centering), white fill.

    Matches ``ResizeWithPadding`` (TrOCR letterbox to 1024x64, white fill,
    content anchored at origin). Returns (canvas, gain).
    """
    canvas, gain, _ = letterbox(
        image, out_h, out_w, fill=1.0, method=method, center=False
    )
    return canvas, gain


@jax.jit
def normalize_image(
    image: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray
) -> jnp.ndarray:
    """Channel normalize (image in [0,1], HWC or NHWC)."""
    return (image - mean) / std


# Kuzushiji dataset channel stats (reference src/configs/preprocessing.yaml:18-20).
# Host (numpy) constants on purpose: a module-level jnp.array initializes the
# JAX backend at import time, which hangs every CPU-side tool (synth, ETL,
# dataset viewers) whenever the TPU tunnel is unreachable.
KUZUSHIJI_MEAN = np.array([0.75696, 0.71561, 0.63938], np.float32)
KUZUSHIJI_STD = np.array([0.19681, 0.20038, 0.24713], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
