"""On-device image ingestion: uint8 -> normalized float, photometric aug.

Why uint8 transport: the TPU sits behind a tunnel whose client retains the
host copy of EVERY host->device transfer for the life of the process
(measured ~12.6 MB leaked per 12.6 MB batch — a float32 image pipeline
OOM-kills a 125 GB host in under an hour of training). Shipping raw uint8
pixels and normalizing inside the jitted step cuts both the leak rate and
the tunnel bandwidth 4x, and moves the divide/subtract onto the VPU where
XLA fuses it into the first conv — the reference does the same conversion
on-GPU in its AMP path (``yolov12/ultralytics/engine/trainer.py:361``
``batch["img"].float() / 255``).

Contract: datasets and host-side predictors emit raw uint8 RGB pixels;
every model entry point calls :func:`from_uint8` with its own
normalization convention. Float inputs pass through unchanged (already
normalized) so exported graphs and existing float callers keep working.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def from_uint8(
    x: jnp.ndarray,
    mean: float = 0.0,
    std: float = 1.0,
    dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """uint8 pixels -> ``((x/255) - mean) / std``; float passes through.

    The dtype dispatch is static under jit (dtypes are trace-time
    constants), so each input dtype gets its own specialized program.
    """
    if x.dtype == jnp.uint8:
        out = x.astype(dtype or jnp.float32) / 255.0
        if mean != 0.0 or std != 1.0:
            out = (out - mean) / std
        return out
    return x if dtype is None else x.astype(dtype)


def photometric_aug(
    x: jnp.ndarray,
    rng: jax.Array,
    contrast: tuple[float, float] = (0.85, 1.15),
    brightness: float = 0.12,
    noise: float = 0.04,
) -> jnp.ndarray:
    """Per-sample contrast/brightness/gaussian-noise on a [0,1] float batch.

    On-device replacement for the host-side photometric jitter the OCR
    datasets used to apply per sample (``ocr_datasets.load_letterboxed``):
    on a 1-core host the numpy noise draw alone cost ~2 ms/sample; here it
    is VPU work fused into the input pipeline. Geometric jitter (scale /
    paste offset) stays on the host where PIL resampling is cheap and
    shape-dynamic.
    """
    b = x.shape[0]
    shp = (b,) + (1,) * (x.ndim - 1)
    k1, k2, k3 = jax.random.split(rng, 3)
    c = jax.random.uniform(k1, shp, x.dtype, contrast[0], contrast[1])
    t = jax.random.uniform(k2, shp, x.dtype, -brightness, brightness)
    n = jax.random.normal(k3, x.shape, x.dtype) * noise
    return jnp.clip(x * c + t + n, 0.0, 1.0)
