"""AutoBackend: run inference from any exported/serialized model artifact.

Capability parity with the reference ``AutoBackend``
(``yolov12/ultralytics/nn/autobackend.py``, 763 LoC runtime dispatch across
PyTorch/ONNX/TRT/TFLite/...): one class that loads a kuzu run directory, a
serialized StableHLO artifact, a TF SavedModel, or a .tflite blob and
exposes the same padded-detection call.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


class AutoBackend:
    def __init__(self, source: str | Path, **cfg: Any):
        self.source = Path(source)
        self.kind = self._detect_kind(self.source)
        self._load(cfg)

    @staticmethod
    def _detect_kind(p: Path) -> str:
        if p.is_dir() and (p / "weights").exists():
            return "run_dir"
        if p.suffix == ".stablehlo":
            return "stablehlo"
        if p.suffix == ".tflite":
            return "tflite"
        if p.suffix == ".onnx":
            return "onnx"
        if p.is_dir() and (p / "saved_model.pb").exists():
            return "saved_model"
        raise ValueError(f"cannot identify model artifact: {p}")

    def _load(self, cfg: dict) -> None:
        if self.kind == "run_dir":
            from kuzu.core.config import load_config
            from kuzu.tasks.detect import DetectPredictor

            self._predictor = DetectPredictor(
                load_config(overrides={"model": str(self.source), **cfg})
            )
            self._predictor._setup()
        elif self.kind == "stablehlo":
            from kuzu.api.export import load_exported

            self._fn = load_exported(self.source)
            import json

            meta = self.source.with_suffix(".json")
            self.meta = json.loads(meta.read_text()) if meta.exists() else {}
        elif self.kind == "saved_model":
            import tensorflow as tf

            self._tf = tf.saved_model.load(str(self.source))
        elif self.kind == "tflite":
            import tensorflow as tf

            self._interp = tf.lite.Interpreter(model_path=str(self.source))
            self._interp.allocate_tensors()
        elif self.kind == "onnx":
            # gated like export_onnx: onnxruntime is not in this image
            try:
                import onnxruntime as ort
            except ImportError as e:
                raise ImportError(
                    "loading .onnx requires the 'onnxruntime' package "
                    "(not in this environment)"
                ) from e
            self._sess = ort.InferenceSession(str(self.source))

    def __call__(self, images: np.ndarray) -> dict[str, np.ndarray]:
        """(B, H, W, 3) float32 [0,1] -> padded detections dict."""
        if self.kind == "run_dir":
            out = self._predictor._fwd(np.asarray(images))
            return {k: np.asarray(v) for k, v in out.items()}
        if self.kind == "onnx":
            name = self._sess.get_inputs()[0].name
            outs = self._sess.run(None, {name: np.asarray(images, np.float32)})
            boxes, scores, classes, valid = outs[:4]
            return {
                "boxes": np.asarray(boxes),
                "scores": np.asarray(scores),
                "classes": np.asarray(classes),
                "valid": np.asarray(valid),
            }
        if self.kind == "stablehlo":
            out = self._fn(images)
            if isinstance(out, dict):
                return {k: np.asarray(v) for k, v in out.items()}
            boxes, scores, classes, valid = out
            return {
                "boxes": np.asarray(boxes), "scores": np.asarray(scores),
                "classes": np.asarray(classes), "valid": np.asarray(valid),
            }
        if self.kind == "saved_model":
            out = self._tf.f(images)
            if not isinstance(out, (list, tuple)):
                return {"pred": np.asarray(out)}  # raw decode (exported w/o NMS)
            boxes, scores, classes, valid = (np.asarray(t) for t in out)
            return {"boxes": boxes, "scores": scores, "classes": classes, "valid": valid}
        # tflite
        inp = self._interp.get_input_details()[0]
        self._interp.set_tensor(inp["index"], images.astype(np.float32))
        self._interp.invoke()
        outs = [
            np.asarray(self._interp.get_tensor(d["index"]))
            for d in self._interp.get_output_details()
        ]
        # order: boxes (B,K,4), scores, classes, valid — match by shape/dtype
        boxes = next(o for o in outs if o.ndim == 3 and o.shape[-1] == 4)
        valid = next(o for o in outs if o.dtype == bool)
        rest = [o for o in outs if o is not boxes and o is not valid]
        scores = next(o for o in rest if o.dtype.kind == "f")
        classes = next(o for o in rest if o.dtype.kind in "iu")
        return {"boxes": boxes, "scores": scores, "classes": classes, "valid": valid}
