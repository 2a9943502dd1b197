"""CTC CRNN recognizer: conv encoder -> BiLSTM -> per-timestep char logits.

Capability parity with the reference's two CTC models:
- ``OCRModel`` (``scripts/ocr_model.py:12``): ResNet encoder ->
  AdaptiveAvgPool(1, None) -> BiLSTM -> char logits + bbox head,
  CTC(blank=0) + SmoothL1;
- ``ocr_lightning/model.py:8-80``: ResNet34 + pooled-feature LSTM +
  fixed-``max_boxes`` localization head.

TPU-first shape discipline: the time axis is the column's long dimension
(vertical Japanese text -> height); conv strides keep T = H/4 so CTC's
T >= 2L+1 constraint holds for 128-char labels at 1024-px columns. The
box head predicts a fixed ``max_boxes`` set (normalized xyxy) from pooled
features — no ragged outputs.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from kuzu.models.layers import ConvBN


class ConvEncoder(nn.Module):
    """Strided ConvBN pyramid; collapses the non-time axis by mean."""

    dims: tuple[int, ...] = (64, 128, 256, 256)
    time_axis: str = "height"  # "height" (vertical columns) | "width" (lines)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.time_axis == "width":
            x = jnp.transpose(x, (0, 2, 1, 3))  # time axis -> axis 1
        # stage strides: halve time twice (T = H/4), collapse the other axis
        strides = [(2, 2), (2, 2), (1, 2), (1, 2)]
        for i, (d, s) in enumerate(zip(self.dims, strides)):
            x = ConvBN(d, kernel=3, stride=1, dtype=self.dtype, name=f"conv{i}a")(
                x, train=train
            )
            # anisotropic stride via dedicated conv
            x = nn.Conv(
                d,
                (3, 3),
                strides=s,
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                dtype=self.dtype,
                name=f"down{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = nn.silu(x)
        return x.mean(axis=2)  # (B, T, C) — average over the short axis


class CRNN(nn.Module):
    num_classes: int
    dims: tuple[int, ...] = (64, 128, 256, 256)
    lstm_hidden: int = 256
    time_axis: str = "height"
    max_boxes: int = 0  # >0 enables the fixed-size bbox head
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray | None]:
        """(B, H, W, C) -> (logits (B, T, num_classes), boxes (B, max_boxes, 4)|None)."""
        from kuzu.ops.images import from_uint8

        images = from_uint8(images, mean=0.5, std=0.5)  # OCR input convention
        feat = ConvEncoder(self.dims, self.time_axis, dtype=self.dtype, name="encoder")(
            images, train=train
        )
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden), name="lstm_fwd")
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.lstm_hidden), reverse=True,
            keep_order=True, name="lstm_bwd",
        )
        h = jnp.concatenate(
            [fwd(feat.astype(jnp.float32)), bwd(feat.astype(jnp.float32))], axis=-1
        )
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(h)
        boxes = None
        if self.max_boxes > 0:
            pooled = h.mean(axis=1)  # (B, 2*hidden)
            b = nn.Dense(512, name="box_fc")(pooled)
            b = nn.relu(b)
            b = nn.Dense(self.max_boxes * 4, name="box_out")(b)
            boxes = nn.sigmoid(b.reshape(-1, self.max_boxes, 4))  # normalized
        return logits, boxes
