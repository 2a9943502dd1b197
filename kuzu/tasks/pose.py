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
    head_kind = "pose"

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
        pose_nodes = [n for n in spec.nodes if n.module == "Pose"]
        if ks and pose_nodes:
            # dataset yaml overrides the model head (reference PoseModel);
            # only when the model actually HAS a Pose node — otherwise the
            # spec would falsely claim a pose head and defeat the
            # head/task guard in DetectTrainer.build_model
            for node in pose_nodes:
                node.args[1] = list(ks)
            spec.kpt_shape = tuple(ks)
        return spec

    def validate(self, state) -> dict[str, float]:
        """Pose validation: box mAP plus OKS-matched pose mAP through the
        shared AP machinery — the reference ``PoseValidator`` feeds
        ``kpt_iou`` (OKS, cocoeval form with the 0.53 area factor) into
        ``match_predictions`` (``models/yolo/pose/val.py:185-197``);
        fitness sums pose and box fitness (``utils/metrics.py:1146``)."""
        from kuzu.core.metrics import DetMetrics
        from kuzu.ops.pose_loss import OKS_SIGMA_17

        params = state.ema_params if state.ema_params is not None else state.params
        variables = {"params": params, **(state.model_state or {})}
        fwd = getattr(self, "_val_fwd", None)
        if fwd is None:
            conf = float(self.cfg.get("conf") or 0.001)
            iou_t = float(self.cfg.get("iou", 0.7))
            max_det = int(self.cfg.get("max_det", 300))
            imgsz = self.imgsz

            def _fwd(variables, images):
                outputs = self.detector.infer(variables, images)
                pred = self.detector.decode(outputs, imgsz=imgsz)
                # single-label NMS keeps indices in anchor space for the
                # keypoint gather (pose nc is 1 in practice)
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

            fwd = self._val_fwd = jax.jit(_fwd)

        from kuzu.tasks.base import resolve_val_batches

        use_scipy = bool(self.cfg.get("val_scipy", False))
        dm_box = DetMetrics(use_scipy=use_scipy)
        dm_pose = DetMetrics(use_scipy=use_scipy)
        max_batches = resolve_val_batches(self.cfg, self.val_loader)
        for bi, batch in enumerate(self.val_loader):
            if bi >= max_batches:
                break
            mask = batch.pop("sample_mask", np.ones(len(batch["image"]), np.float32))
            out = fwd(variables, jnp.asarray(batch["image"]))
            out = {k: np.asarray(v) for k, v in out.items()}
            for i in range(len(batch["image"])):
                if mask[i] == 0:
                    continue
                pv = np.asarray(out["valid"][i], bool)
                pb = out["boxes"][i][pv]
                ps = out["scores"][i][pv]
                pc = out["classes"][i][pv]
                pk = out["kpts"][i][pv]  # (n, K, 2/3) letterboxed px
                gv = np.asarray(batch["mask_gt"][i], bool)
                gb = np.asarray(batch["gt_boxes"][i])[gv]
                gc = np.asarray(batch["gt_labels"][i])[gv]
                gk = np.asarray(batch["gt_kpts"][i])[gv]
                dm_box.update(
                    pb, ps, pc, np.ones(len(pb), bool),
                    gb, gc, np.ones(len(gb), bool),
                )
                dm_pose.update(
                    pb, ps, pc, np.ones(len(pb), bool),
                    gb, gc, np.ones(len(gb), bool),
                    iou_matrix=oks_matrix(gk, pk, gb, OKS_SIGMA_17),
                )
        box = dm_box.compute()
        pose = dm_pose.compute()
        return {
            "map50": box["map50"], "map": box["map"],
            "precision": box["precision"], "recall": box["recall"],
            "pose_map50": pose["map50"], "pose_map": pose["map"],
            "fitness": box["fitness"] + pose["fitness"],
        }

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
            reg_max=self.detector.spec.reg_max,
        )
        return total, (metrics, dict(mutated))


def oks_matrix(
    gt_kpts: np.ndarray,
    pred_kpts: np.ndarray,
    gt_boxes: np.ndarray,
    sigma17: np.ndarray,
) -> np.ndarray:
    """(n_gt, n_pred) Object Keypoint Similarity — the reference ``kpt_iou``
    (``utils/metrics.py:156-175``, cocoeval Gaussian) with box area × 0.53
    (``pose/val.py:191``). GT keypoints with zero coords count as
    invisible."""
    n_gt, n_pred = len(gt_kpts), len(pred_kpts)
    if n_gt == 0 or n_pred == 0:
        return np.zeros((n_gt, n_pred), np.float32)
    K = gt_kpts.shape[1]
    sigma = (
        np.asarray(sigma17, np.float32)
        if K == 17
        else np.full((K,), 1.0 / K, np.float32)
    )
    d2 = ((gt_kpts[:, None, :, :2] - pred_kpts[None, :, :, :2]) ** 2).sum(-1)
    if gt_kpts.shape[-1] == 3:
        vis = gt_kpts[..., 2] != 0  # (n_gt, K)
    else:
        vis = np.abs(gt_kpts[..., :2]).sum(-1) > 0
    wh = gt_boxes[:, 2:4] - gt_boxes[:, :2]
    area = wh[:, 0] * wh[:, 1] * 0.53
    e = d2 / ((2 * sigma[None, None]) ** 2 * (area[:, None, None] + 1e-7) * 2)
    return (np.exp(-e) * vis[:, None]).sum(-1) / (
        vis.sum(-1)[:, None] + 1e-7
    )


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
        self._fwd = lambda images: self._fwd_jit(self.variables, self._put(images))

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
