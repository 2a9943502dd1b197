"""Pallas NMS kernel parity vs the XLA scan reference (interpreter mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kuzu.ops.nms import _suppress
from kuzu.ops.pallas_nms import pallas_suppress


def _rand_sorted(rng, b, k):
    xy = rng.uniform(0, 200, size=(b, k, 2)).astype(np.float32)
    wh = rng.uniform(5, 40, size=(b, k, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=-1)
    return boxes


@pytest.mark.parametrize("variant", ["full", "chunked", "batched"])
def test_pallas_matches_scan(rng, variant):
    b, k = 2, 256
    boxes = _rand_sorted(rng, b, k)
    valid = np.ones((b, k), bool)
    valid[:, -10:] = False
    keep_pl = np.asarray(
        pallas_suppress(
            jnp.asarray(boxes),
            jnp.asarray(valid),
            iou_threshold=0.5,
            interpret=True,
            variant=variant,
        )
    )
    for i in range(b):
        from kuzu.ops.boxes import box_iou_matrix

        iou = box_iou_matrix(jnp.asarray(boxes[i]), jnp.asarray(boxes[i]))
        iou = jnp.where(
            jnp.asarray(valid[i])[None, :] & jnp.asarray(valid[i])[:, None], iou, 0.0
        )
        keep_ref = np.asarray(_suppress(iou, 0.5)) & valid[i]
        np.testing.assert_array_equal(keep_pl[i], keep_ref)


def test_variant_auto_gates_on_shape():
    """ADVICE r4: 'batched'/'chunked' have validated VMEM/program bounds;
    shapes past them must route to a kernel that scales ('full')."""
    from kuzu.ops.pallas_nms import _select_variant

    assert _select_variant(8, 16) == "batched"  # validated chip config
    assert _select_variant(1, 32) == "batched"
    assert _select_variant(16, 32) == "chunked"  # b*s over the unroll bound
    assert _select_variant(1, 64) == "chunked"  # tiling merge 8192-bucket
    assert _select_variant(8, 128) == "full"  # 16384-bucket: 8.3 MB temps
    assert _select_variant(1, 999) == "full"


def test_auto_variant_midsize_matches_scan(rng):
    """Interpret-mode parity at a tiling-merge bucket shape the ADVICE
    flagged: b*s = 512 is past the batched unroll bound -> auto = chunked."""
    b, k = 16, 4096
    boxes = _rand_sorted(rng, b, k)
    valid = np.ones((b, k), bool)
    valid[:, k // 2 :] = False  # realistic: most candidates below conf
    keep_pl = np.asarray(
        pallas_suppress(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True
        )
    )
    from kuzu.ops.boxes import box_iou_matrix

    for i in range(2):  # parity spot-check (full-B is O(B*K^2) here)
        iou = box_iou_matrix(jnp.asarray(boxes[i]), jnp.asarray(boxes[i]))
        iou = jnp.where(
            jnp.asarray(valid[i])[None, :] & jnp.asarray(valid[i])[:, None],
            iou,
            0.0,
        )
        keep_ref = np.asarray(_suppress(iou, 0.5)) & valid[i]
        np.testing.assert_array_equal(keep_pl[i], keep_ref)


def test_auto_variant_largest_bucket_matches_chunked(rng):
    """S = 128 (the 16384 tiling bucket): auto must route to 'full'; pin
    its keeps against the explicit chunked kernel (a scan reference at
    K=16384 is O(K^2) on the host — the kernels cross-check instead)."""
    b, k = 1, 16384
    boxes = _rand_sorted(rng, b, k)
    valid = np.ones((b, k), bool)
    valid[:, 600:] = False  # post-conf realism: few thousand live boxes
    args = (jnp.asarray(boxes), jnp.asarray(valid), 0.5)
    keep_auto = np.asarray(pallas_suppress(*args, interpret=True))
    keep_chunked = np.asarray(
        pallas_suppress(*args, interpret=True, variant="chunked")
    )
    np.testing.assert_array_equal(keep_auto, keep_chunked)
    assert keep_auto[0, 0]


def test_pallas_dense_cluster(rng):
    """Heavy-overlap stress: many near-duplicates around few centers."""
    k = 128
    centers = rng.uniform(50, 150, size=(4, 2))
    boxes = []
    for i in range(k):
        c = centers[i % 4] + rng.normal(0, 1.5, 2)
        boxes.append([c[0], c[1], c[0] + 30, c[1] + 30])
    boxes = np.asarray(boxes, np.float32)[None]
    valid = np.ones((1, k), bool)
    keep = np.asarray(
        pallas_suppress(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True)
    )[0]
    # roughly one survivor per cluster
    assert 3 <= keep.sum() <= 8
    # highest-scoring (first) box always kept
    assert keep[0]
