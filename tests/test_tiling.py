import numpy as np

from kuzu.pipeline.tiling import (
    grid_bounds,
    merge_tile_detections,
    rewrite_boxes_for_tile,
    tile_image,
)


def test_grid_bounds_2x2():
    b = grid_bounds(2, overlap=0.15)
    assert len(b) == 4
    # top-left tile: starts at origin, extends past the midpoint by overlap/2
    np.testing.assert_allclose(b[0], (0.0, 0.0, 0.575, 0.575))
    # bottom-right starts before midpoint
    np.testing.assert_allclose(b[3], (0.425, 0.425, 1.0, 1.0))
    # neighbouring tiles overlap
    assert b[0][2] > b[1][0]


def test_grid_bounds_3x3():
    b = grid_bounds(3, overlap=0.15)
    assert len(b) == 9
    # center tile extends both ways
    cx = b[4]
    assert cx[0] < 1 / 3 and cx[2] > 2 / 3


def test_tile_image_shapes():
    img = (np.random.default_rng(0).uniform(0, 255, (200, 160, 3))).astype(np.uint8)
    tiles, metas = tile_image(img, grid=2, overlap=0.15, tile_size=64)
    assert tiles.shape == (4, 64, 64, 3)
    assert tiles.dtype == np.uint8  # raw pixels; detectors normalize on-device
    assert len(metas) == 4
    assert metas[0]["origin"] == (0, 0)


def test_rewrite_boxes_contained():
    boxes = np.array([[10.0, 10, 50, 50], [100, 100, 150, 150]])
    out, keep = rewrite_boxes_for_tile(boxes, (0, 0, 80, 80))
    np.testing.assert_array_equal(keep, [True, False])
    np.testing.assert_allclose(out[0], [10, 10, 50, 50])
    out2, keep2 = rewrite_boxes_for_tile(boxes, (90, 90, 200, 200))
    assert keep2[1]
    np.testing.assert_allclose(out2[1], [10, 10, 60, 60])


def test_merge_tile_detections_dedups_overlap():
    # same physical box seen by two tiles -> one efter merge
    metas = [
        {"origin": (0, 0), "gain": 1.0, "pad": (0, 0)},
        {"origin": (50, 0), "gain": 1.0, "pad": (0, 0)},
    ]
    det1 = {
        "boxes": np.array([[60.0, 10, 80, 30]]),
        "scores": np.array([0.9]),
        "classes": np.array([0]),
        "valid": np.array([True]),
    }
    det2 = {
        "boxes": np.array([[10.0, 10, 30, 30]]),  # same page box (origin 50)
        "scores": np.array([0.8]),
        "classes": np.array([0]),
        "valid": np.array([True]),
    }
    merged = merge_tile_detections([det1, det2], metas, iou_thres=0.5)
    assert len(merged["boxes"]) == 1
    np.testing.assert_allclose(merged["boxes"][0], [60, 10, 80, 30], atol=1e-3)
    assert merged["scores"][0] == 0.9


def test_merge_pages_batched_equals_per_page():
    """One nms_padded_batch call over the page batch must reproduce the
    per-page merge exactly (incl. a page with zero candidates)."""
    from kuzu.pipeline.tiling import merge_tile_detections_pages

    rng = np.random.default_rng(3)
    metas = [
        {"origin": (0, 0), "gain": 1.0, "pad": (0, 0)},
        {"origin": (50, 0), "gain": 1.0, "pad": (0, 0)},
    ]
    pages, page_metas = [], []
    for p in range(3):
        per_tile = []
        for _ in metas:
            n = 0 if p == 1 else 6
            xy = rng.uniform(0, 60, (n, 2))
            wh = rng.uniform(5, 20, (n, 2))
            per_tile.append(
                {
                    "boxes": np.concatenate([xy, xy + wh], 1),
                    "scores": rng.uniform(0.1, 1.0, n),
                    "classes": np.zeros(n, int),
                    "valid": np.ones(n, bool),
                }
            )
        pages.append(per_tile)
        page_metas.append(metas)
    batched = merge_tile_detections_pages(
        pages, page_metas, iou_thres=0.5, page_shapes=[(100, 120)] * 3
    )
    for per_tile, m, got in zip(pages, page_metas, batched):
        want = merge_tile_detections(
            per_tile, m, iou_thres=0.5, page_shape=(100, 120)
        )
        for k in ("boxes", "scores", "classes"):
            np.testing.assert_allclose(got[k], want[k], atol=1e-6)
    assert len(batched[1]["boxes"]) == 0


def test_merge_empty():
    metas = [{"origin": (0, 0), "gain": 1.0, "pad": (0, 0)}]
    det = {
        "boxes": np.zeros((5, 4)),
        "scores": np.zeros(5),
        "classes": np.zeros(5, int),
        "valid": np.zeros(5, bool),
    }
    merged = merge_tile_detections([det], metas)
    assert len(merged["boxes"]) == 0
