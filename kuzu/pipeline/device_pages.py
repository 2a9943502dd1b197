"""Ship-once page transport: pages cross host->device ONCE as raw uint8;
the column-stage letterbox, the char-stage overlap tiles, and the
recognizer crop-letterboxes all derive ON DEVICE.

Why: the production cascade was transfer-bound, not compute-bound — per
12-page batch it shipped ~59 MB of column-det pages + ~73 MB of char
tiles + ~66 MB of recognizer crops through a ~50 MB/s tunnel whose client
also leaks host RAM 1:1 with bytes shipped (PERFORMANCE.md "uint8
ingestion"). Tiles and crops are pure functions of the page pixels, so
deriving them on device cuts host->device bytes ~3x and the leak with it.
On a directly-attached TPU host the same design removes the PCIe copies.

Geometry contracts match the host implementations exactly (same
gain/pad/origin arithmetic): `device_letterbox` == `letterbox_np`,
`device_tiles` == `tiling.tile_image`, `device_crops` ==
`cascade._letterbox_crop` of the margin-expanded column window — pixel
values agree to resize-kernel rounding (bilinear, no antialias, like
cv2.INTER_LINEAR). Pinned in tests/test_device_pages.py.
"""

from __future__ import annotations

from functools import partial

import jax

from kuzu.pipeline.tiling import grid_bounds


def _resize_u8(x, nh: int, nw: int):
    """Bilinear resize of a uint8 batch (B, h, w, 3) -> (B, nh, nw, 3),
    cv2.INTER_LINEAR-like (no antialias), rounded back to uint8."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = x.shape
    if (nh, nw) == (h, w):
        return x
    r = jax.image.resize(
        x.astype(jnp.float32), (b, nh, nw, c), method="linear",
        antialias=False,
    )
    return jnp.clip(jnp.round(r), 0, 255).astype(jnp.uint8)


def device_letterbox(pages, size, fill: int = 114):
    """`letterbox_np` on device: (B, H, W, 3) uint8 -> ((B, th, tw, 3)
    uint8, gain, (pad_x, pad_y)). Call under jit; geometry is static."""
    import jax.numpy as jnp

    th, tw = (size, size) if isinstance(size, int) else (int(size[0]), int(size[1]))
    b, h, w, _ = pages.shape
    gain = min(th / h, tw / w)
    nw, nh = max(int(round(w * gain)), 1), max(int(round(h * gain)), 1)
    r = _resize_u8(pages, nh, nw)
    px, py = (tw - nw) // 2, (th - nh) // 2
    if (nh, nw) == (th, tw):
        return r, gain, (px, py)
    canvas = jnp.full((b, th, tw, 3), fill, jnp.uint8)
    import jax

    canvas = jax.lax.dynamic_update_slice(canvas, r, (0, py, px, 0))
    return canvas, gain, (px, py)


def pack_yc(pages, stride: int = 4):
    """Host side of the chroma-subsampled transport: RGB uint8
    (B, H, W, 3) -> (Y (B, H, W, 1), CrCb (B, H/s, W/s, 2)) uint8.

    Kuzushiji pages are near-monochrome ink on warm paper — chroma is
    low-frequency, so full-res luma + s*s mean-pooled chroma carries the
    page in ~(1 + 2/s^2)/3 of the bytes (2.7x fewer at s=4). The
    detectors train with JPEG augmentation (4:2:0 chroma), so the
    reconstruction error is inside the training distribution. cv2 does
    the colorspace + pooling (SIMD) so host cost stays small on the
    1-core production host."""
    import cv2

    b, h, w, _ = pages.shape
    assert h % stride == 0 and w % stride == 0, (h, w, stride)
    ys, cs = [], []
    for im in pages:
        ycc = cv2.cvtColor(im, cv2.COLOR_RGB2YCrCb)
        ys.append(ycc[..., 0])
        cs.append(
            cv2.resize(
                ycc[..., 1:], (w // stride, h // stride),
                interpolation=cv2.INTER_AREA,
            )
        )
    import numpy as np

    return np.stack(ys)[..., None], np.stack(cs)


def unpack_yc(y, c):
    """Device side: (Y, CrCb) uint8 -> RGB uint8 (B, H, W, 3) under jit
    (bilinear chroma upsample + cv2's full-range YCrCb inverse)."""
    import jax.numpy as jnp

    b, h, w, _ = y.shape
    cf = jax.image.resize(
        c.astype(jnp.float32), (b, h, w, 2), method="linear", antialias=False
    )
    yf = y.astype(jnp.float32)[..., 0]
    cr = cf[..., 0] - 128.0
    cb = cf[..., 1] - 128.0
    rgb = jnp.stack(
        [
            yf + 1.403 * cr,
            yf - 0.714 * cr - 0.344 * cb,
            yf + 1.773 * cb,
        ],
        axis=-1,
    )
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def tile_bounds_px(h: int, w: int, grid: int, overlap: float):
    """Pixel tile bounds, identical ints to `tiling.tile_image`."""
    return [
        (int(x1 * w), int(y1 * h), int(x2 * w), int(y2 * h))
        for x1, y1, x2, y2 in grid_bounds(grid, overlap)
    ]


def device_tiles(pages, grid: int, overlap: float, tile_size: int):
    """`tiling.tile_image` on device for a page batch.

    pages (B, H, W, 3) uint8 -> (tiles (B*T, S, S, 3) uint8 page-major —
    page0's T tiles, then page1's, matching the host loop order in
    `_process_pages_tiled` — and the per-tile metas of ONE page (all pages
    share geometry))."""
    import jax.numpy as jnp

    b, h, w, _ = pages.shape
    outs, metas = [], []
    for px1, py1, px2, py2 in tile_bounds_px(h, w, grid, overlap):
        crop = pages[:, py1:py2, px1:px2]
        canvas, gain, (pad_x, pad_y) = device_letterbox(crop, tile_size)
        outs.append(canvas)
        metas.append(
            {"origin": (px1, py1), "gain": gain, "pad": (pad_x, pad_y)}
        )
    t = len(outs)
    tiles = jnp.stack(outs, axis=1).reshape(b * t, tile_size, tile_size, 3)
    return tiles, metas


@partial(jax.jit, static_argnames=("out_h", "out_w", "fill", "chunk"))
def device_crops(
    pages,  # (B, H, W, 3) uint8, device-resident
    page_idx,  # (N,) int32
    boxes,  # (N, 4) float32 xyxy page pixels (margin-expanded, clipped)
    out_h: int = 1024,
    out_w: int = 64,
    fill: int = 255,
    chunk: int = 16,
):
    """`cascade._letterbox_crop` on device with dynamic windows.

    Each crop resamples its page window to (out_h, out_w) with the
    letterbox convention (gain = min(out_h/ch, out_w/cw), content at the
    top-left, `fill` elsewhere). Bilinear sampling is two manual gathers +
    lerps — no per-crop weight matrices. Crops process in chunks via
    `lax.map` to bound the gather transient. Returns (N, out_h, out_w, 3)
    uint8.
    """
    import jax
    import jax.numpy as jnp

    n = page_idx.shape[0]
    pad = (-n) % chunk
    if pad:
        page_idx = jnp.concatenate([page_idx, jnp.zeros((pad,), page_idx.dtype)])
        boxes = jnp.concatenate([boxes, jnp.tile(jnp.array([[0.0, 0, 2, 2]], boxes.dtype), (pad, 1))])
    h, w = pages.shape[1], pages.shape[2]

    def one(args):
        pidx, box = args
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        ch = jnp.maximum(jnp.floor(y2) - jnp.floor(y1), 1.0)
        cw = jnp.maximum(jnp.floor(x2) - jnp.floor(x1), 1.0)
        x1, y1 = jnp.floor(x1), jnp.floor(y1)
        y2, x2 = y1 + ch, x1 + cw
        gain = jnp.minimum(out_h / ch, out_w / cw)
        # host convention (_letterbox_crop): content size truncates to
        # int(c * gain); cv2 then stretches the crop to EXACTLY that size,
        # so the effective per-dim scale is c/n, not 1/gain
        nh = jnp.maximum(jnp.floor(ch * gain), 1.0)
        nw = jnp.maximum(jnp.floor(cw * gain), 1.0)
        # output pixel centers -> page coords (cv2 resize convention)
        ys = y1 + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (ch / nh) - 0.5
        xs = x1 + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (cw / nw) - 0.5
        # clamp sampling to the window so edges replicate (cv2 crops first)
        ys = jnp.clip(ys, y1, y2 - 1.0)
        xs = jnp.clip(xs, x1, x2 - 1.0)
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        fy = (ys - y0.astype(jnp.float32))[:, None, None]
        fx = (xs - x0.astype(jnp.float32))[None, :, None]
        img = pages[pidx].astype(jnp.float32)
        rows0 = img[y0]  # (out_h, W, 3)
        rows1 = img[y1i]
        top = rows0[:, x0] * (1 - fx) + rows0[:, x1i] * fx  # (out_h, out_w, 3)
        bot = rows1[:, x0] * (1 - fx) + rows1[:, x1i] * fx
        out = top * (1 - fy) + bot * fy
        # letterbox mask: beyond the scaled content -> fill
        oy = jnp.arange(out_h, dtype=jnp.float32)[:, None, None]
        ox = jnp.arange(out_w, dtype=jnp.float32)[None, :, None]
        out = jnp.where((oy < nh) & (ox < nw), out, float(fill))
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    batched = jax.lax.map(
        jax.vmap(one),
        (
            page_idx.reshape(-1, chunk),
            boxes.reshape(-1, chunk, 4),
        ),
    )
    return batched.reshape(-1, out_h, out_w, 3)[:n]
