"""Tall-column packing: split-and-arrange resize for square-input encoders.

Capability parity with the reference ``src/utils/image_resize.py`` (P17):
aspect-preserving resize to a target width (``:39``), then split the tall
column into fixed-height segments, rotate each 90 degrees and tile them onto
a square canvas left-to-right, top-to-bottom (``:62-120``) — the reference's
trick for feeding very tall vertical-text columns to square-input models
(SURVEY §5.7 long-context mechanism #2).
"""

from __future__ import annotations

import numpy as np


def resize_preserve_aspect(img: np.ndarray, target_width: int = 64) -> np.ndarray:
    """Resize (H, W, C) so W == target_width, H scaled to keep aspect."""
    import cv2

    h, w = img.shape[:2]
    new_h = max(int(round(h * target_width / w)), 1)
    return cv2.resize(img, (target_width, new_h), interpolation=cv2.INTER_LINEAR)


def split_and_arrange(
    img: np.ndarray,
    segment_height: int = 384,
    canvas_size: int | None = None,
    fill: int = 255,
) -> np.ndarray:
    """Split a (H, W, C) column into segment_height strips, rotate each 90deg
    (CCW), and grid-pack onto a square canvas.

    After rotation each segment is (W, segment_height); they tile
    left-to-right then top-to-bottom. canvas defaults to segment_height so a
    64-wide column packs segment_height/64 segments per column of the grid.
    """
    h, w = img.shape[:2]
    canvas_size = canvas_size or segment_height
    n_seg = max((h + segment_height - 1) // segment_height, 1)
    cols_per_row = max(canvas_size // segment_height, 1)
    rows_avail = max(canvas_size // w, 1)
    canvas = np.full(
        (canvas_size, canvas_size, img.shape[2] if img.ndim == 3 else 1),
        fill,
        np.uint8,
    )
    for i in range(min(n_seg, cols_per_row * rows_avail)):
        seg = img[i * segment_height : (i + 1) * segment_height]
        if seg.shape[0] < segment_height:  # pad the last strip
            pad = np.full(
                (segment_height - seg.shape[0], *seg.shape[1:]), fill, np.uint8
            )
            seg = np.concatenate([seg, pad], axis=0)
        rot = np.rot90(seg)  # (W, segment_height, C)
        row, col = divmod(i, cols_per_row)
        y, x = row * w, col * segment_height
        canvas[y : y + w, x : x + segment_height] = rot
    return canvas


def process_column_for_square_input(
    img: np.ndarray, target_width: int = 64, segment_height: int = 384
) -> np.ndarray:
    """Full pipeline: width-normalize, then split-rotate-pack to a square."""
    resized = resize_preserve_aspect(img, target_width)
    if resized.shape[0] <= segment_height:
        # short column: single rotation onto the canvas
        return split_and_arrange(resized, segment_height)
    return split_and_arrange(resized, segment_height)
