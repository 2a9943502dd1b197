"""Model export: StableHLO serialization via jax.export.

Capability parity with the reference exporter's deployable-artifact story
(``yolov12/ultralytics/engine/exporter.py:107`` — TorchScript/ONNX/TRT/...):
on TPU the portable format is StableHLO. ``export_detector`` serializes the
jitted forward+decode (and optionally NMS) with frozen weights; the artifact
reloads with ``jax.export.deserialize`` on any JAX runtime and is the
input for further conversion (e.g. TFLite via the StableHLO converter).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def export_fn(
    fn,
    example_args: tuple,
    out_path: str | Path,
    metadata: dict | None = None,
) -> Path:
    """Serialize a jittable fn to <out_path>.stablehlo (+ .json metadata)."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    blob = out_path.with_suffix(".stablehlo")
    blob.write_bytes(data)
    meta = {
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        **(metadata or {}),
    }
    out_path.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return blob


def load_exported(path: str | Path):
    """Deserialize and return a callable."""
    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call


def export_detector(
    run_dir: str | Path,
    out_path: str | Path | None = None,
    batch: int = 1,
    include_nms: bool = True,
    conf: float = 0.25,
    iou: float = 0.45,
    max_det: int = 300,
) -> Path:
    """Export a trained detect run: image batch -> padded detections."""
    from kuzu.core.config import load_config
    from kuzu.tasks.detect import DetectPredictor

    run_dir = Path(run_dir)
    predictor = DetectPredictor(
        load_config(
            overrides={"model": str(run_dir), "conf": conf, "iou": iou, "max_det": max_det}
        )
    )
    predictor._setup()
    det = predictor.detector
    variables = predictor.variables
    imgsz = predictor.imgsz

    from kuzu.ops.nms import non_max_suppression

    def fwd(images):
        feats = det.module.apply(variables, images, train=False)
        pred = det.decode(feats, imgsz=imgsz)
        if include_nms:
            return non_max_suppression(
                pred, conf_thres=conf, iou_thres=iou, max_det=max_det
            )
        return pred

    example = (jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32),)
    out_path = Path(out_path or (run_dir / "export" / "detector"))
    return export_fn(
        fwd,
        example,
        out_path,
        metadata={
            "model": str(run_dir),
            "imgsz": imgsz,
            "batch": batch,
            "include_nms": include_nms,
            "conf": conf,
            "iou": iou,
            "max_det": max_det,
        },
    )


def export_tf(
    fn,
    example_args: tuple,
    out_path: str | Path,
    fmt: str = "saved_model",  # 'saved_model' | 'tflite'
    platform: str = "cpu",
) -> Path:
    """Serialize via jax2tf (portable CPU lowering) to SavedModel or TFLite.

    Parity with the reference exporter's TF-family targets
    (``engine/exporter.py``: saved_model/pb/tflite). Requires tensorflow.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if fmt == "tflite":
        # the TFLite converter cannot legalize every StableHLO op that
        # native serialization embeds (e.g. the variadic mhlo.reduce that
        # argmax lowers to, kuzu/ops/nms.py decode) — lower through the
        # legacy graph path to plain TF ops so TFLITE_BUILTINS +
        # SELECT_TF_OPS covers the whole program, NMS included
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            tf_fn = jax2tf.convert(
                jax.jit(fn), native_serialization=False, enable_xla=False
            )
    else:
        tf_fn = jax2tf.convert(
            jax.jit(fn), native_serialization_platforms=(platform,)
        )
    specs = [tf.TensorSpec(np.shape(a), str(np.asarray(a).dtype)) for a in example_args]
    module = tf.Module()
    module.f = tf.function(tf_fn, input_signature=specs, autograph=False)
    if fmt == "saved_model":
        dst = out_path.with_suffix("") if out_path.suffix else out_path
        tf.saved_model.save(module, str(dst))
        return dst
    if fmt == "tflite":
        conv = tf.lite.TFLiteConverter.from_concrete_functions(
            [module.f.get_concrete_function(*specs)], module
        )
        conv.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        blob = conv.convert()
        dst = out_path.with_suffix(".tflite")
        dst.write_bytes(blob)
        return dst
    raise ValueError(f"unknown tf export format '{fmt}'")


def export_onnx(saved_model_dir: str | Path, out_path: str | Path) -> Path:
    """SavedModel -> ONNX via tf2onnx (reference ``engine/exporter.py:107``
    export_onnx). tf2onnx/onnx are not in this image, so the hop is gated
    like the IIIF fetch: present, tested for its error contract, and active
    the moment the dependency exists.
    """
    try:
        from tf2onnx import convert as _convert
    except ImportError as e:
        raise ImportError(
            "ONNX export needs the 'tf2onnx' + 'onnx' packages "
            "(not in this environment). Export format=saved_model and run "
            "`python -m tf2onnx.convert --saved-model <dir> --output "
            "model.onnx` where they are installed."
        ) from e
    out_path = Path(out_path).with_suffix(".onnx")
    _convert.from_saved_model(str(saved_model_dir), output_path=str(out_path))
    return out_path


class Exporter:
    """Task-map component for ``Model(...).export()``."""

    def __init__(self, cfg: Any):
        self.cfg = cfg

    def run(self) -> Path:
        fmt = str(self.cfg.get("format", "stablehlo"))
        run_dir = str(self.cfg.get("model"))
        kwargs = dict(
            batch=int(self.cfg.get("batch", 1)),
            include_nms=bool(self.cfg.get("nms", True)),
            conf=float(self.cfg.get("conf") or 0.25),
            iou=float(self.cfg.get("iou", 0.45)),
            max_det=int(self.cfg.get("max_det", 300)),
        )
        if fmt == "stablehlo":
            return export_detector(run_dir, **kwargs)
        if fmt == "onnx":
            # two-hop: SavedModel first, then tf2onnx (gated on the dep)
            saved = self._export_tf_family(run_dir, "saved_model", kwargs)
            return export_onnx(saved, Path(run_dir) / "export" / "detector")
        if fmt in ("saved_model", "tflite"):
            return self._export_tf_family(run_dir, fmt, kwargs)
        raise NotImplementedError(f"format '{fmt}' not supported")

    def _export_tf_family(self, run_dir: str, fmt: str, kwargs: dict) -> Path:
        from kuzu.core.config import load_config
        from kuzu.tasks.detect import DetectPredictor

        predictor = DetectPredictor(
            load_config(
                overrides={"model": run_dir, "conf": kwargs["conf"],
                           "iou": kwargs["iou"], "max_det": kwargs["max_det"]}
            )
        )
        predictor._setup()
        det, variables, imgsz = (
            predictor.detector, predictor.variables, predictor.imgsz
        )
        from kuzu.ops.nms import non_max_suppression

        def fwd(images):
            feats = det.module.apply(variables, images, train=False)
            pred = det.decode(feats, imgsz=imgsz)
            if kwargs["include_nms"]:
                out = non_max_suppression(
                    pred, conf_thres=kwargs["conf"], iou_thres=kwargs["iou"],
                    max_det=kwargs["max_det"],
                )
                return (out["boxes"], out["scores"],
                        out["classes"], out["valid"])
            return pred

        example = (
            jnp.zeros((kwargs["batch"], imgsz, imgsz, 3), jnp.float32),
        )
        return export_tf(
            fwd, example, Path(run_dir) / "export" / f"detector_{fmt}", fmt=fmt
        )
