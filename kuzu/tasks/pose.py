"""Pose (keypoint) task (reference ``models/yolo/pose/*`` + ``PoseModel``,
``nn/tasks.py``; loss ``v8PoseLoss``): detect stack + per-anchor keypoints,
OKS location loss, visibility BCE, and keypoints on the predict Results.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.api.model import register_task
from kuzu.data.loader import DataLoader
from kuzu.data.yolo_dataset import YoloPoseDataset, load_dataset_yaml
from kuzu.models.yolo.modules import kpts_decode
from kuzu.ops.anchors import make_anchors
from kuzu.ops.nms import non_max_suppression
from kuzu.ops.pose_loss import pose_loss
from kuzu.tasks.detect import DetectPredictor, DetectTrainer, DetectValidator


class PoseTrainer(DetectTrainer):
    def build_datasets(self):
        cfg = self.cfg
        imgsz = int(cfg.get("imgsz", 640))
        max_boxes = int(cfg.get("max_boxes", 300))
        self.data_spec = load_dataset_yaml(cfg.data)
        mk = lambda split, augment: YoloPoseDataset(
            self.data_spec, split=split, imgsz=imgsz, max_boxes=max_boxes,
            augment=augment, seed=int(cfg.get("seed", 0)),
        )
        self.train_ds = mk("train", bool(cfg.get("augment", True)))
        try:
            self.val_ds = mk("val", False)
        except FileNotFoundError:
            self.val_ds = mk("train", False)
        batch = int(cfg.get("batch", 16))
        workers = int(cfg.get("workers", 4))
        return (
            DataLoader(
                self.train_ds, batch, shuffle=True,
                seed=int(cfg.get("seed", 0)), num_workers=workers,
            ),
            DataLoader(
                self.val_ds, batch, shuffle=False, pad_last=True,
                num_workers=workers,
            ),
        )

    def _resolve_model(self, name: str):
        from kuzu.models.yolo.graph import parse_model_yaml, resolve_model_spec

        path, scale = resolve_model_spec(name)
        spec = parse_model_yaml(path, scale=scale, nc=self.data_spec["nc"])
        ks = self.data_spec.get("kpt_shape")
        if ks:  # dataset yaml overrides the model head (reference PoseModel)
            for node in spec.nodes:
                if node.module == "Pose":
                    node.args[1] = list(ks)
            spec.kpt_shape = tuple(ks)
        return spec

    def loss_fn(self, params, model_state, batch, rng):
        variables = {"params": params, **model_state}
        outputs, mutated = self.detector.apply(
            variables, batch["image"], train=True, mutable=["batch_stats"]
        )
        total, metrics = pose_loss(
            outputs,
            batch["gt_labels"],
            batch["gt_boxes"],
            batch["gt_kpts"],
            batch["mask_gt"],
            nc=self.detector.nc,
            imgsz=self.imgsz,
            strides=tuple(self.detector.strides),
            box_w=float(self.cfg.get("box", 7.5)),
            cls_w=float(self.cfg.get("cls", 0.5)),
            dfl_w=float(self.cfg.get("dfl", 1.5)),
            pose_w=float(self.cfg.get("pose", 12.0)),
            kobj_w=float(self.cfg.get("kobj", 1.0)),
        )
        return total, (metrics, dict(mutated))


class Keypoints:
    """Per-detection keypoints in the original image frame (reference
    ``engine/results.py`` Keypoints)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = data  # (n, K, D) — xy px (+ visibility prob)
        self.orig_shape = orig_shape

    def __len__(self) -> int:
        return len(self.data)

    @property
    def xy(self) -> np.ndarray:
        return self.data[..., :2]

    @property
    def conf(self) -> np.ndarray:
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class PosePredictor(DetectPredictor):
    """Detect predictor whose jitted forward also returns decoded keypoints
    for the NMS survivors (pixel coords + sigmoid visibility)."""

    def _resolve_arch(self, name: str, data_spec: dict):
        from kuzu.models.yolo.graph import parse_model_yaml, resolve_model_spec

        path, scale = resolve_model_spec(name)
        spec = parse_model_yaml(path, scale=scale, nc=data_spec["nc"])
        ks = data_spec.get("kpt_shape")
        if ks:
            for node in spec.nodes:
                if node.module == "Pose":
                    node.args[1] = list(ks)
            spec.kpt_shape = tuple(ks)
        return spec

    def _setup(self):
        super()._setup()
        conf = float(self.cfg.get("conf") or 0.25)
        iou_t = float(self.cfg.get("iou", 0.7))
        max_det = int(self.cfg.get("max_det", 300))
        imgsz = self.imgsz

        def _fwd(variables, images):
            outputs = self.detector.infer(variables, images)
            pred = self.detector.decode(outputs, imgsz=imgsz)
            out = non_max_suppression(
                pred, conf_thres=conf, iou_thres=iou_t, max_det=max_det,
                return_indices=True,
            )
            feats = outputs["det"]
            shapes = [(f.shape[1], f.shape[2]) for f in feats]
            anchor_points, stride_t = make_anchors(
                shapes, list(self.detector.strides)
            )
            kp = kpts_decode(anchor_points, outputs["kpts_raw"])
            kp_px = jnp.concatenate(
                [kp[..., :2] * stride_t[None, :, None, :],
                 jax.nn.sigmoid(kp[..., 2:])],
                axis=-1,
            )
            out["kpts"] = jnp.take_along_axis(
                kp_px, out["indices"][..., None, None], axis=1
            )
            return out

        self._fwd_jit = jax.jit(_fwd)
        self._fwd = lambda images: self._fwd_jit(self.variables, images)

    def _attach_extras(self, result, out, i, valid, orig_shape, gain, pad) -> None:
        kp = np.asarray(out["kpts"][i][valid]).copy()
        if len(kp):
            kp[..., 0] = (kp[..., 0] - pad[0]) / gain
            kp[..., 1] = (kp[..., 1] - pad[1]) / gain
        result.keypoints = Keypoints(kp, orig_shape)


class PoseValidator(DetectValidator):
    pass


register_task(
    "pose",
    trainer=PoseTrainer,
    validator=PoseValidator,
    predictor=PosePredictor,
)
