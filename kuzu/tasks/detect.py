"""Detection task: YOLOv12 training, mAP validation, NMS prediction.

Parity with the reference detect stack: ``DetectionTrainer`` /
``DetectionValidator`` / ``DetectionPredictor``
(``yolov12/ultralytics/models/yolo/detect/*``, driven by
``scripts/train_character_detection.py``): v8 loss over TAL assignment,
mAP50/50-95 fitness, padded NMS predict with box rescaling to the source
frame, EMA weights for eval, bf16 compute on the MXU.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.api.model import register_task
from kuzu.core.callbacks import LOGGER
from kuzu.core.metrics import DetMetrics
from kuzu.data.loader import DataLoader
from kuzu.data.yolo_dataset import YoloDetectionDataset, letterbox_np, load_dataset_yaml
from kuzu.models.yolo.detector import YoloDetector
from kuzu.ops.detect_loss import detection_loss, e2e_detection_loss
from kuzu.ops.nms import nms_free_select, non_max_suppression
from kuzu.tasks.base import BaseTrainer


def spec_head_kind(spec) -> str:
    """Head family of a parsed graph spec — the reference infers this from
    the model yaml to route tasks (``yolov12/ultralytics/nn/tasks.py``
    ``guess_model_task``)."""
    if spec.classify:
        return "classify"
    if spec.obb:
        return "obb"
    if spec.kpt_shape:
        return "pose"
    if spec.seg_nm:
        return "segment"
    return "detect"


class DetectTrainer(BaseTrainer):
    # head family the task's loss/validator expects; checked against the
    # parsed model spec so `train pose model=yolov8n` fails with a clear
    # message instead of a shape error deep inside the loss
    head_kind = "detect"
    # model-construction hook: any YoloDetector-protocol class (NAS family
    # swaps in kuzu.models.nas.NASDetector)
    detector_cls = YoloDetector

    def build_datasets(self):
        cfg = self.cfg
        imgsz = int(cfg.get("imgsz", 640))
        max_boxes = int(cfg.get("max_boxes", 300))
        hyp = {
            k: float(cfg.get(k))
            for k in (
                "mosaic", "fliplr", "flipud", "hsv_h", "hsv_s", "hsv_v",
                "degrees", "translate", "scale", "shear", "perspective",
                "mixup", "copy_paste", "erasing",
            )
            if cfg.get(k) is not None
        }
        self.data_spec = load_dataset_yaml(cfg.data)
        rect = bool(cfg.get("rect", False))
        self.train_ds = YoloDetectionDataset(
            self.data_spec,
            split="train",
            imgsz=imgsz,
            max_boxes=max_boxes,
            augment=bool(cfg.get("augment", True)),
            hyp=hyp,
            seed=int(cfg.get("seed", 0)),
            rect=rect,
            cache_images=cfg.get("cache_images"),
        )
        try:
            self.val_ds = YoloDetectionDataset(
                self.data_spec, split="val", imgsz=imgsz,
                max_boxes=max_boxes, augment=False, rect=rect,
            )
        except FileNotFoundError:
            self.val_ds = YoloDetectionDataset(
                self.data_spec, split="train", imgsz=imgsz,
                max_boxes=max_boxes, augment=False, rect=rect,
            )
        batch = int(cfg.get("batch", 16))
        workers = int(cfg.get("workers", 4))
        train_loader = _EpochLoader(
            self.train_ds, batch, seed=int(cfg.get("seed", 0)),
            num_workers=workers,
            group_fn=self.train_ds.batch_shape_key if self.train_ds.rect else None,
        )
        val_loader = DataLoader(
            self.val_ds, batch, shuffle=False, pad_last=True, num_workers=workers,
            group_fn=self.val_ds.batch_shape_key if self.val_ds.rect else None,
        )
        return train_loader, val_loader

    def build_model(self) -> Any:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.get("dtype") == "bfloat16" else jnp.float32
        self.imgsz = int(cfg.get("imgsz", 640))
        name = str(cfg.get("model") or "yolov12n")
        self.detector = self.detector_cls(
            self._resolve_model(name), nc=self.data_spec["nc"], dtype=dtype,
            imgsz=self.imgsz, remat=bool(cfg.get("remat", False)),
            reg_max=(
                int(cfg.get("reg_max")) if cfg.get("reg_max") else None
            ),
        )
        kind = spec_head_kind(self.detector.spec)
        if kind != self.head_kind:
            base = name.split("-")[0]
            hint = base if self.head_kind == "detect" else f"{base}-{self.head_kind}"
            raise ValueError(
                f"model '{name}' has a {kind} head but task "
                f"'{cfg.get('task', self.head_kind)}' needs a {self.head_kind} "
                f"head (e.g. model={hint})"
            )
        variables = self.detector.init(
            jax.random.key(int(cfg.get("seed", 0))), imgsz=self.imgsz
        )
        self._model_state = {
            k: v for k, v in variables.items() if k != "params"
        }
        # optional pretrained graft (reference partial .load for P2 surgery)
        pre = cfg.get("pretrained")
        if isinstance(pre, str) and Path(pre).exists():
            from kuzu.core.checkpoint import CheckpointManager, partial_load

            mgr = CheckpointManager(Path(pre))
            src = mgr.restore("best" if mgr.exists("best") else "last")
            src_params = src.get("params", src) if isinstance(src, dict) else src.params
            # a LoRA-trained source stores {"base", "lora"} — fuse before graft
            from kuzu.core.config import load_config
            from kuzu.core.lora import is_lora_tree, maybe_merge

            if is_lora_tree(src_params):
                pre_args = Path(pre).parent / "args.yaml"
                src_params = maybe_merge(
                    src_params,
                    load_config(pre_args) if pre_args.exists() else None,
                )
            grafted, n, t = partial_load(variables["params"], src_params)
            LOGGER.info(f"pretrained graft: {n}/{t} tensors from {pre}")
            return grafted
        return variables["params"]

    def _resolve_model(self, name: str):
        """Hook: tasks may patch the parsed spec (e.g. pose kpt_shape from
        the dataset yaml, reference PoseModel data override)."""
        return name

    def _init_model_state(self):
        return self._model_state

    def loss_fn(self, params, model_state, batch, rng):
        variables = {"params": params, **model_state}
        feats, mutated = self.detector.apply(
            variables, batch["image"], train=True, mutable=["batch_stats"]
        )
        loss = (
            e2e_detection_loss if self.detector.spec.end2end else detection_loss
        )
        total, metrics = loss(
            feats,
            batch["gt_labels"],
            batch["gt_boxes"],
            batch["mask_gt"],
            nc=self.detector.nc,
            imgsz=self.imgsz,
            strides=tuple(self.detector.strides),
            box_w=float(self.cfg.get("box", 7.5)),
            cls_w=float(self.cfg.get("cls", 0.5)),
            dfl_w=float(self.cfg.get("dfl", 1.5)),
            reg_max=self.detector.spec.reg_max,
        )
        return total, (metrics, dict(mutated))

    def validate(self, state) -> dict[str, float]:
        params = state.ema_params if state.ema_params is not None else state.params
        variables = {"params": params, **(state.model_state or {})}
        conf = float(self.cfg.get("conf") or 0.001)
        iou_t = float(self.cfg.get("iou", 0.7))
        max_det = int(self.cfg.get("max_det", 300))

        fwd = getattr(self, "_val_fwd", None)
        if fwd is None:

            def _fwd(variables, images):
                feats = self.detector.infer(variables, images)
                pred = self.detector.decode(feats, imgsz=self.imgsz)
                if self.detector.spec.end2end:  # v10: NMS-free one2one
                    return nms_free_select(
                        pred, conf_thres=conf, max_det=max_det
                    )
                # multi_label: score every class above threshold per anchor,
                # matching reference val semantics (utils/ops.py:230-260)
                return non_max_suppression(
                    pred, conf_thres=conf, iou_thres=iou_t, max_det=max_det,
                    multi_label=True,
                )

            fwd = self._val_fwd = jax.jit(_fwd)

        dm = DetMetrics(use_scipy=bool(self.cfg.get("val_scipy", False)))
        from kuzu.tasks.base import resolve_val_batches

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
                dm.update(
                    out["boxes"][i],
                    out["scores"][i],
                    out["classes"][i],
                    out["valid"][i],
                    batch["gt_boxes"][i],
                    batch["gt_labels"][i],
                    batch["mask_gt"][i],
                )
        res = dm.compute()
        return {**res}

    # hook: mosaic close near the end (reference close_mosaic=10)
    def train(self):
        close = int(self.cfg.get("close_mosaic", 10))
        epochs = int(self.cfg.get("epochs", 1))

        orig_cb = self.callbacks

        def maybe_close(trainer):
            if close > 0 and trainer.epoch >= max(epochs - close, 0):
                trainer.train_ds.close_mosaic()

        orig_cb.add("on_epoch_start", maybe_close)
        return super().train()


class _EpochLoader(DataLoader):
    """DataLoader that forwards set_epoch to the dataset (mosaic seeding)."""

    def __init__(self, dataset, batch, seed=0, num_workers=4, group_fn=None):
        super().__init__(
            dataset, batch, shuffle=True, seed=seed, num_workers=num_workers,
            group_fn=group_fn,
        )

    def set_epoch(self, epoch: int) -> None:
        super().set_epoch(epoch)
        self.dataset.set_epoch(epoch)


class DetectValidator:
    trainer_cls: Any = None  # resolved to DetectTrainer below (class order)

    def __init__(self, cfg):
        self.cfg = cfg

    def run(self) -> dict:
        cfg = self.cfg
        ckpt = cfg.get("model")
        run_dir = Path(str(ckpt)) if ckpt else None
        if run_dir and (run_dir / "args.yaml").exists():
            # a trained run dir: rebase on its training config (arch, imgsz,
            # hyp) and re-apply only the keys the user explicitly overrode
            from kuzu.core.config import rebase_on_run_config

            cfg = rebase_on_run_config(cfg, run_dir)
        trainer = (self.trainer_cls or DetectTrainer)(cfg)
        trainer.train_loader, trainer.val_loader = trainer.build_datasets()
        params = trainer.build_model()
        from kuzu.core.checkpoint import CheckpointManager
        from kuzu.core.train import build_optimizer, init_state

        state = init_state(
            params,
            build_optimizer(self.cfg),
            use_ema=True,
            model_state=trainer._model_state,
        )
        ckpt = self.cfg.get("model")
        run_dir = Path(str(ckpt)) if ckpt else None
        if run_dir and (run_dir / "weights").exists():
            from kuzu.core.checkpoint import load_inference_params

            mgr = CheckpointManager(run_dir / "weights")
            p, ms = load_inference_params(mgr, state, train_cfg=cfg)
            state = state.replace(
                params=p,
                ema_params=None,
                model_state=ms if ms is not None else state.model_state,
            )
        return trainer.validate(state)


class DetectPredictor:
    """Load a trained run dir; predict padded detections on images."""

    detector_cls = YoloDetector

    def __init__(self, cfg):
        self.cfg = cfg
        self.ready = False

    def _setup(self):
        from kuzu.core.checkpoint import CheckpointManager
        from kuzu.core.config import load_config
        from kuzu.core.train import build_optimizer, init_state

        run_dir = Path(str(self.cfg.get("model")))
        train_cfg = load_config(
            run_dir / "args.yaml" if (run_dir / "args.yaml").exists() else None
        )
        self.imgsz = int(train_cfg.get("imgsz", 640))
        data_spec = load_dataset_yaml(train_cfg.data)
        self.names = data_spec.get("names", {})
        arch = str(train_cfg.get("model") or "yolov12n")
        self.detector = self.detector_cls(
            self._resolve_arch(arch, data_spec), nc=data_spec["nc"],
            imgsz=self.imgsz,
            reg_max=(
                int(train_cfg.get("reg_max"))
                if train_cfg.get("reg_max") else None
            ),
        )
        variables = self.detector.init(jax.random.key(0), imgsz=self.imgsz)
        model_state = {k: v for k, v in variables.items() if k != "params"}
        state = init_state(
            variables["params"],
            build_optimizer(train_cfg),
            use_ema=True,
            model_state=model_state,
        )
        mgr = CheckpointManager(run_dir / "weights")
        from kuzu.core.checkpoint import load_inference_params
        from kuzu.core.mesh import setup_inference_dp

        params, ms = load_inference_params(mgr, state, train_cfg=train_cfg)
        self.variables = {"params": params, **(ms or {})}
        # dp=N: shard host batches over an N-device mesh, replicate weights
        setup_inference_dp(self, self.cfg)
        if self._dp is not None:
            self.variables = self._dp.params(self.variables)
        conf = float(self.cfg.get("conf") or 0.25)
        iou_t = float(self.cfg.get("iou", 0.7))
        max_det = int(self.cfg.get("max_det", 300))

        # weights are a jit ARGUMENT, never a closure: closed-over arrays
        # bake into the HLO as constants and can exceed the tunneled
        # remote-compile size limit (see CLAUDE.md).
        def _fwd(variables, images):
            feats = self.detector.infer(variables, images)
            pred = self.detector.decode(feats, imgsz=self.imgsz)
            if self.detector.spec.end2end:  # v10: NMS-free one2one
                return nms_free_select(pred, conf_thres=conf, max_det=max_det)
            return non_max_suppression(
                pred, conf_thres=conf, iou_thres=iou_t, max_det=max_det
            )

        self._fwd_jit = jax.jit(_fwd)
        self._fwd = lambda images: self._fwd_jit(
            self.variables, self._put(images)
        )
        self.ready = True

    def _resolve_arch(self, name: str, data_spec: dict):
        """Hook mirroring ``DetectTrainer._resolve_model`` (pose kpt_shape)."""
        return name

    def __call__(self, source, max_frames: int | None = None) -> list[dict]:
        """Predict over any source: image path(s)/array(s), directory, glob,
        video file, webcam index, or stream URL (reference
        ``engine/predictor.py:191`` + ``data/loaders.py`` source matrix —
        everything normalizes through ``kuzu.data.sources.resolve_source``).
        Video/stream frames batch through the same bucketed jit programs as
        images. ``max_frames`` bounds live streams."""
        if not self.ready:
            self._setup()
        from kuzu.data.sources import batched_frames, resolve_source

        frames = resolve_source(
            source,
            vid_stride=int(self.cfg.get("vid_stride", 1) or 1),
            max_frames=max_frames,
        )
        batch = int(self.cfg.get("batch", 8) or 8)
        results = []
        for group in batched_frames(frames, batch):
            results.extend(self._predict_frames(group))
        return results

    def _predict_frames(self, frames: list) -> list:
        """One bucketed device batch over decoded RGB frames."""
        images, meta = [], []
        for f in frames:
            h, w = f.image.shape[:2]
            canvas, gain, (px, py) = letterbox_np(f.image, self.imgsz)
            images.append(canvas)  # uint8; the model normalizes on-device
            meta.append((h, w, gain, px, py))
        # pad the frame count to a static bucket (1/2/4/8/...) so repeat
        # calls with varying counts reuse the compiled program
        from kuzu.data.loader import next_bucket

        npad = next_bucket(len(images), min_bucket=self.min_bucket)
        images.extend([np.zeros_like(images[0])] * (npad - len(images)))
        import time as _time

        t0 = _time.perf_counter()
        out = self._fwd(np.stack(images))
        out = {k: np.asarray(v) for k, v in out.items()}
        infer_ms = (_time.perf_counter() - t0) * 1e3 / len(frames)
        from kuzu.api.results import Boxes, Results

        names = getattr(self, "names", {})
        results = []
        for i, (h, w, gain, px, py) in enumerate(meta):
            valid = out["valid"][i]
            boxes = out["boxes"][i][valid]
            boxes = (boxes - [px, py, px, py]) / gain
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
            r = Results(
                orig_img=frames[i].image,
                path=frames[i].path,
                names=names,
                boxes=Boxes(
                    boxes, out["scores"][i][valid], out["classes"][i][valid], (h, w)
                ),
                speed={"inference_ms": infer_ms},
            )
            self._attach_extras(r, out, i, valid, (h, w), gain, (px, py))
            results.append(r)
        return results

    def _attach_extras(
        self, result, out, i, valid, orig_shape, gain, pad
    ) -> None:
        """Hook for composite heads (segment masks, pose keypoints):
        receives the letterbox geometry so extras rescale into the
        original frame like the boxes do."""


from kuzu.api.export import Exporter as _Exporter  # noqa: E402

register_task(
    "detect",
    trainer=DetectTrainer,
    validator=DetectValidator,
    predictor=DetectPredictor,
    exporter=_Exporter,
)
