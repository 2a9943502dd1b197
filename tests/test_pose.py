"""Pose (keypoint) task end-to-end (reference PoseModel + v8PoseLoss +
KeypointLoss, ``utils/loss.py:140-155, 446-600``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml
from PIL import Image, ImageDraw

K = 3  # head, left foot, right foot of a little "stick figure"


def _scene(rng, size=96):
    img = Image.new("RGB", (size, size), (240, 240, 235))
    d = ImageDraw.Draw(img)
    w, h = int(rng.integers(28, 44)), int(rng.integers(36, 52))
    x, y = int(rng.integers(0, size - w)), int(rng.integers(0, size - h))
    head = (x + w // 2, y + 6)
    lf = (x + 6, y + h - 4)
    rf = (x + w - 6, y + h - 4)
    d.ellipse([head[0] - 6, head[1] - 6, head[0] + 6, head[1] + 6], fill=(200, 30, 30))
    d.line([head, (x + w // 2, y + h - 10)], fill=(30, 30, 30), width=3)
    d.line([(x + w // 2, y + h - 10), lf], fill=(30, 30, 200), width=3)
    d.line([(x + w // 2, y + h - 10), rf], fill=(30, 200, 30), width=3)
    kpts = [head, lf, rf]
    row = f"0 {(x + w / 2) / size:.4f} {(y + h / 2) / size:.4f} {w / size:.4f} {h / size:.4f} "
    row += " ".join(f"{kx / size:.4f} {ky / size:.4f} 2" for kx, ky in kpts)
    return img, row


@pytest.fixture(scope="module")
def pose_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("poseds")
    rng = np.random.default_rng(0)
    for split, n in (("train", 12), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img, row = _scene(rng)
            img.save(root / "images" / split / f"{i}.jpg")
            (root / "labels" / split / f"{i}.txt").write_text(row)
    yml = root / "dataset.yaml"
    yml.write_text(
        yaml.safe_dump(
            {"path": ".", "train": "images/train", "val": "images/val",
             "names": {0: "person"}, "nc": 1, "kpt_shape": [K, 3],
             "flip_idx": [0, 2, 1]}
        )
    )
    return yml


def test_pose_dataset_keypoints(pose_dataset):
    from kuzu.data.yolo_dataset import YoloPoseDataset

    ds = YoloPoseDataset(pose_dataset, split="train", imgsz=64, max_boxes=4)
    s = ds[0]
    assert s["gt_kpts"].shape == (4, K, 3)
    n = int(s["mask_gt"].sum())
    assert n == 1
    kp = s["gt_kpts"][0]
    assert (kp[:, 2] == 2).all()
    # keypoints lie inside the (letterboxed) box
    x1, y1, x2, y2 = s["gt_boxes"][0]
    assert (kp[:, 0] >= x1 - 1).all() and (kp[:, 0] <= x2 + 1).all()


def test_kpts_decode_roundtrip():
    from kuzu.models.yolo.modules import kpts_decode

    anchors = jnp.asarray([[0.5, 0.5], [1.5, 0.5]])
    raw = jnp.zeros((1, 2, K, 3))
    out = np.asarray(kpts_decode(anchors, raw))
    np.testing.assert_allclose(out[0, 0, :, 0], 0.0)  # 0*2 + 0.5 - 0.5
    np.testing.assert_allclose(out[0, 1, :, 0], 1.0)


def test_pose_loss_decreases_with_correct_kpts(pose_dataset):
    """The OKS term must prefer keypoints matching the GT: loss with GT
    coords injected as predictions < loss with wrong coords."""
    from kuzu.data.yolo_dataset import YoloPoseDataset
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.pose_loss import pose_loss

    ds = YoloPoseDataset(pose_dataset, split="train", imgsz=64, max_boxes=4)
    batch = {
        k: jnp.asarray(np.stack([ds[i][k] for i in range(2)]))
        for k in ("image", "gt_boxes", "gt_labels", "mask_gt", "gt_kpts")
    }
    # the tiny toy K lands on the head via spec surgery (what PoseTrainer
    # does from the dataset yaml's kpt_shape)
    from kuzu.models.yolo.graph import parse_model_yaml

    spec = parse_model_yaml(
        "kuzu/cfg/models/yolov8-pose.yaml", scale="n", nc=1
    )
    for node in spec.nodes:
        if node.module == "Pose":
            node.args[1] = [K, 3]
    spec.kpt_shape = (K, 3)
    det = YoloDetector(spec, imgsz=64)
    v = det.init(jax.random.key(0), imgsz=64)
    out = det.apply(v, batch["image"])
    total, metrics = pose_loss(
        out, batch["gt_labels"], batch["gt_boxes"], batch["gt_kpts"],
        batch["mask_gt"], nc=1, imgsz=64, strides=tuple(det.strides),
    )
    assert np.isfinite(float(total)) and float(metrics["kpt_loss"]) > 0
    assert float(metrics["kobj_loss"]) > 0


def test_pose_trainer_end_to_end(pose_dataset, tmp_path):
    from kuzu.core.config import load_config
    from kuzu.tasks.pose import PosePredictor, PoseTrainer

    cfg = load_config(
        overrides=dict(
            task="pose", model="yolov8n-pose", data=str(pose_dataset),
            epochs=1, batch=4, imgsz=64, max_boxes=4, workers=0,
            dtype="float32", project=str(tmp_path / "runs"), name="p",
            exist_ok=True, val_batches=1, optimizer="adamw",
            warmup_epochs=0.0, lr0=0.002,
        )
    )
    trainer = PoseTrainer(cfg)
    result = trainer.train()
    assert np.isfinite(result["loss"]) and result["kpt_loss"] > 0
    assert "pose_map50" in result and "map50" in result  # OKS + box mAP

    pred_cfg = load_config(
        overrides=dict(task="pose", model=str(trainer.save_dir), conf=0.0001)
    )
    predictor = PosePredictor(pred_cfg)
    img = pose_dataset.parent / "images" / "val" / "0.jpg"
    r = predictor([img])[0]
    assert r.keypoints is not None and len(r.keypoints) == len(r.boxes)
    if len(r.keypoints):
        assert r.keypoints.xy.shape[1:] == (K, 2)
        assert r.keypoints.conf is not None


def test_oks_matrix_perfect_and_distant():
    from kuzu.ops.pose_loss import OKS_SIGMA_17
    from kuzu.tasks.pose import oks_matrix

    gt_k = np.array([[[10.0, 10, 2], [20, 30, 2], [30, 10, 2]]], np.float32)
    gt_b = np.array([[5.0, 5, 35, 35]], np.float32)
    perfect = oks_matrix(gt_k, gt_k, gt_b, OKS_SIGMA_17)
    assert perfect.shape == (1, 1) and perfect[0, 0] > 0.99

    far = gt_k.copy()
    far[..., :2] += 500
    assert oks_matrix(gt_k, far, gt_b, OKS_SIGMA_17)[0, 0] < 1e-3

    # invisible keypoints (v=0) are excluded from the average
    gt_part = gt_k.copy()
    gt_part[0, 2, 2] = 0
    pred_off = gt_k.copy()
    pred_off[0, 2, :2] += 500  # wrong only where invisible
    assert oks_matrix(gt_part, pred_off, gt_b, OKS_SIGMA_17)[0, 0] > 0.99


def test_head_task_mismatch_raises(pose_dataset, tmp_path):
    """A detect-head model under the pose task fails fast with a clear
    error naming the fix, not a shape error deep in the loss (reference
    routes by yaml head via ``nn/tasks.py`` guess_model_task)."""
    from kuzu.core.config import load_config
    from kuzu.tasks.pose import PoseTrainer

    cfg = load_config(
        overrides=dict(
            task="pose", model="yolov8n", data=str(pose_dataset),
            epochs=1, batch=2, imgsz=64, max_boxes=4, workers=0,
            project=str(tmp_path / "runs"), name="mismatch", exist_ok=True,
        )
    )
    with pytest.raises(ValueError, match="detect head.*pose.*yolov8n-pose"):
        PoseTrainer(cfg).train()
