"""Ship-once transport: on-device letterbox/tiles/crops match the host
implementations (geometry exactly; pixels to resize-kernel rounding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pages(rng=None):
    r = np.random.default_rng(0)
    return r.integers(0, 255, (3, 256, 192, 3), np.uint8)


def test_device_letterbox_matches_host(pages):
    from kuzu.data.yolo_dataset import letterbox_np
    from kuzu.pipeline.device_pages import device_letterbox

    ref, gain_h, (px_h, py_h) = letterbox_np(pages[0], 128)
    out, gain, (px, py) = jax.jit(
        lambda p: device_letterbox(p, 128)
    )(jnp.asarray(pages))
    assert (gain, px, py) == (gain_h, px_h, py_h)
    out0 = np.asarray(out[0]).astype(np.int16)
    diff = np.abs(out0 - ref.astype(np.int16))
    assert diff.mean() < 1.0 and (diff <= 4).mean() > 0.99


def test_device_tiles_match_host(pages):
    from kuzu.pipeline.device_pages import device_tiles
    from kuzu.pipeline.tiling import tile_image

    ref_tiles, ref_metas = tile_image(pages[1], grid=2, overlap=0.15, tile_size=96)
    tiles, metas = jax.jit(
        lambda p: device_tiles(p, 2, 0.15, 96)
    )(jnp.asarray(pages))
    assert [m["origin"] for m in metas] == [m["origin"] for m in ref_metas]
    assert [m["pad"] for m in metas] == [m["pad"] for m in ref_metas]
    np.testing.assert_allclose(
        [m["gain"] for m in metas], [m["gain"] for m in ref_metas]
    )
    t = len(ref_metas)
    got = np.asarray(tiles).reshape(len(pages), t, 96, 96, 3)[1]
    diff = np.abs(got.astype(np.int16) - ref_tiles.astype(np.int16))
    assert diff.mean() < 1.0 and (diff <= 4).mean() > 0.99


def test_device_crops_match_host_letterbox(pages):
    from kuzu.pipeline.cascade import KuzushijiPipeline
    from kuzu.pipeline.device_pages import device_crops

    boxes = np.array(
        [[10, 20, 40, 200], [100, 5, 130, 120], [0, 0, 192, 256]], np.float32
    )
    pidx = np.array([0, 2, 1], np.int32)
    out = np.asarray(
        device_crops(
            jnp.asarray(pages), jnp.asarray(pidx), jnp.asarray(boxes),
            out_h=128, out_w=32, chunk=2,
        )
    )
    assert out.shape == (3, 128, 32, 3)
    for i in range(3):
        x1, y1, x2, y2 = boxes[i].astype(int)
        crop = pages[pidx[i]][y1:y2, x1:x2]
        ref = KuzushijiPipeline._letterbox_crop(crop, (128, 32))
        diff = np.abs(out[i].astype(np.int16) - ref.astype(np.int16))
        # bilinear kernels agree away from the content edge; the fill
        # region must match exactly
        assert (diff <= 6).mean() > 0.97, (i, diff.mean())
        gain = min(128 / crop.shape[0], 32 / crop.shape[1])
        nh, nw = int(crop.shape[0] * gain), int(crop.shape[1] * gain)
        assert (out[i][nh + 1 :] == 255).all()
        assert (out[i][:, nw + 1 :] == 255).all()


def test_yc_transport_roundtrip(pages):
    """Chroma-subsampled transport: Y carries luma exactly (to rounding);
    the reconstructed RGB stays within JPEG-aug-level error on warm-toned
    ink-on-paper content (kuzu/pipeline/device_pages.py::pack_yc)."""
    from kuzu.pipeline.device_pages import pack_yc, unpack_yc

    # warm paper + dark ink strokes, like the production pages
    rng = np.random.default_rng(0)
    page = np.full((64, 64, 3), (246, 232, 190), np.uint8)
    for _ in range(6):
        x, y = rng.integers(4, 48, 2)
        page[y : y + 12, x : x + 3] = (40, 30, 25)
    batch = np.stack([page, np.flip(page, 1)])

    y, c = pack_yc(batch, stride=4)
    assert y.shape == (2, 64, 64, 1) and c.shape == (2, 16, 16, 2)
    # transport bytes: (1 + 2/16) / 3 of raw RGB
    assert (y.nbytes + c.nbytes) / batch.nbytes < 0.38

    rec = np.asarray(jax.jit(unpack_yc)(jnp.asarray(y), jnp.asarray(c)))
    assert rec.shape == batch.shape and rec.dtype == np.uint8
    err = np.abs(rec.astype(np.int16) - batch.astype(np.int16))
    # paper regions reconstruct almost exactly; stroke edges bleed chroma
    assert np.median(err) <= 2, np.median(err)
    assert err.mean() < 6, err.mean()
    # luminance is preserved everywhere (chroma subsampling never touches Y)
    lum = batch.astype(np.float32) @ np.array([0.299, 0.587, 0.114])
    lum_rec = rec.astype(np.float32) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(lum - lum_rec).mean() < 3.5


def test_cascade_transport_flag_plumbs():
    from kuzu.pipeline.cascade import KuzushijiPipeline

    p = KuzushijiPipeline(transport="yc", col_imgsz=960)
    assert p.transport == "yc" and p.col_imgsz == 960
    p = KuzushijiPipeline()
    assert p.transport == "rgb" and p.col_imgsz is None
