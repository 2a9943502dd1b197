"""kuzu — TPU-native Kuzushiji OCR framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the Kotomiya07/kuzushiji-vision
reference (PyTorch/CUDA) as an idiomatic TPU framework:

- ``kuzu.ops``      jit/Pallas kernels: boxes, IoU, NMS, CTC, letterbox, assigner
- ``kuzu.core``     mesh/sharding, train engine, checkpointing, EMA, config
- ``kuzu.data``     dataset readers + augmentation (YOLO / column / column_info)
- ``kuzu.models``   YOLOv12-style detector, TrOCR recognizer, SimpleViT, char-LM
- ``kuzu.tasks``    detect / recognize / lm trainers + validators
- ``kuzu.pipeline`` page -> columns -> chars -> text cascade
- ``kuzu.api``      Model facade + CLI (yolo-style ``k=v`` overrides)
"""

__version__ = "0.1.0"

from kuzu.api.model import Model, YOLO  # noqa: E402,F401

__all__ = ["Model", "YOLO", "__version__"]
