import jax
import jax.numpy as jnp
import numpy as np

from kuzu.ops.anchors import make_anchors
from kuzu.ops.assigner import anchors_in_gts, task_aligned_assign
from kuzu.ops.detect_loss import _dfl_loss, detection_loss


def test_anchors_in_gts():
    anc = jnp.array([[4.0, 4.0], [12.0, 4.0], [100.0, 100.0]])
    gts = jnp.array([[[0.0, 0, 16, 8]]])  # one gt, batch 1
    m = np.asarray(anchors_in_gts(anc, gts))
    np.testing.assert_array_equal(m[0, 0], [True, True, False])


def _setup_assign(nc=3, A=64, M=4):
    """8x8 grid of stride-8 anchors; one GT covering the top-left quarter."""
    anc, stride = make_anchors([(8, 8)], [8])
    anc_px = np.asarray(anc * stride)
    gt_boxes = np.zeros((1, M, 4), np.float32)
    gt_boxes[0, 0] = [0, 0, 32, 32]
    gt_labels = np.zeros((1, M), np.int32)
    gt_labels[0, 0] = 1
    mask = np.zeros((1, M), bool)
    mask[0, 0] = True
    rng = np.random.default_rng(0)
    pd_scores = rng.uniform(0.1, 0.9, (1, A, nc)).astype(np.float32)
    # predictions = anchor-centered 16px boxes (good IoU inside the GT)
    pd_boxes = np.concatenate([anc_px - 8, anc_px + 8], -1)[None].astype(np.float32)
    return pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes, mask


def test_assigner_selects_inside_topk():
    pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes, mask = _setup_assign()
    out = task_aligned_assign(
        jnp.asarray(pd_scores),
        jnp.asarray(pd_boxes),
        jnp.asarray(anc_px),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes),
        jnp.asarray(mask),
        topk=10,
        num_classes=3,
    )
    fg = np.asarray(out["fg_mask"])[0]
    assert 0 < fg.sum() <= 10
    # all assigned anchors lie inside the GT box (top-left 32x32 -> first 4x4 grid)
    in_gt = (anc_px[:, 0] < 32) & (anc_px[:, 1] < 32)
    assert (fg <= in_gt).all()
    # labels of assigned anchors = 1; scores concentrated on class 1
    labels = np.asarray(out["target_labels"])[0]
    assert (labels[fg] == 1).all()
    ts = np.asarray(out["target_scores"])[0]
    assert (ts[fg][:, 1] > 0).all()
    assert ts[~fg].sum() == 0
    # best-aligned anchor gets normalized score == its overlap-scaled max
    assert ts.max() <= 1.0 + 1e-6


def test_assigner_conflict_resolution():
    """Two identical GTs with different labels: each anchor -> exactly one."""
    pd_scores, pd_boxes, anc_px, gt_labels, gt_boxes, mask = _setup_assign()
    gt_boxes[0, 1] = gt_boxes[0, 0]
    gt_labels[0, 1] = 2
    mask[0, 1] = True
    out = task_aligned_assign(
        jnp.asarray(pd_scores),
        jnp.asarray(pd_boxes),
        jnp.asarray(anc_px),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_boxes),
        jnp.asarray(mask),
        topk=10,
        num_classes=3,
    )
    ts = np.asarray(out["target_scores"])[0]
    fg = np.asarray(out["fg_mask"])[0]
    # each fg anchor has a single-class target
    assert ((ts[fg] > 0).sum(-1) == 1).all()


def test_dfl_loss_zero_at_peaked_integer_target():
    n = 8
    target = jnp.full((n, 4), 5.0)
    logits = jnp.full((n, 4, 16), -20.0).at[:, :, 5].set(20.0)
    loss = np.asarray(_dfl_loss(logits, target))
    np.testing.assert_allclose(loss, 0.0, atol=1e-4)


def test_detection_loss_finite_and_grads():
    """Loss and grads are finite through the full detect stack."""
    rng = np.random.default_rng(0)
    B, nc, imgsz = 2, 3, 64
    strides = (8, 16)
    feats = [
        jnp.asarray(rng.normal(0, 0.1, (B, imgsz // s, imgsz // s, 64 + nc)).astype(np.float32))
        for s in strides
    ]
    gt_labels = jnp.asarray(rng.integers(0, nc, (B, 5)).astype(np.int32))
    xy = rng.uniform(0, 40, (B, 5, 2))
    gt_boxes = jnp.asarray(
        np.concatenate([xy, xy + rng.uniform(8, 24, (B, 5, 2))], -1).astype(np.float32)
    )
    mask = jnp.ones((B, 5), bool)

    def loss_of(feats):
        total, _ = detection_loss(
            feats, gt_labels, gt_boxes, mask, nc=nc, imgsz=imgsz, strides=strides
        )
        return total

    loss, grads = jax.value_and_grad(lambda f: loss_of(f))(feats)
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_detection_loss_decreases_when_optimized():
    """Directly optimizing raw feature maps must drive the loss down a lot —
    end-to-end differentiability + assigner stability check."""
    import optax

    rng = np.random.default_rng(1)
    B, nc, imgsz = 1, 2, 64
    strides = (8, 16)
    feats = [
        jnp.asarray(rng.normal(0, 0.1, (B, imgsz // s, imgsz // s, 64 + nc)).astype(np.float32))
        for s in strides
    ]
    gt_labels = jnp.asarray([[0, 1]], jnp.int32)
    gt_boxes = jnp.asarray([[[8.0, 8, 28, 30], [30, 32, 60, 62]]])
    mask = jnp.ones((1, 2), bool)

    def loss_of(fs):
        total, m = detection_loss(
            fs, gt_labels, gt_boxes, mask, nc=nc, imgsz=imgsz, strides=strides
        )
        return total, m

    tx = optax.adam(0.05)
    opt = tx.init(feats)
    l0 = None
    fs = feats
    for i in range(60):
        (loss, m), g = jax.value_and_grad(loss_of, has_aux=True)(fs)
        if l0 is None:
            l0 = float(loss)
        up, opt = tx.update(g, opt)
        fs = optax.apply_updates(fs, up)
    assert float(loss) < 0.3 * l0, f"loss {l0} -> {float(loss)}"
    assert float(m["num_fg"]) > 0
