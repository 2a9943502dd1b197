"""kuzu.ops — jit-able TPU compute primitives (pure JAX + Pallas kernels)."""

from kuzu.ops.boxes import (  # noqa: F401
    bbox_iou,
    box_area,
    box_iou_matrix,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
)
from kuzu.ops.nms import nms_padded_batch, non_max_suppression  # noqa: F401
from kuzu.ops.pallas_nms import pallas_suppress  # noqa: F401
from kuzu.ops.flash_attention import flash_attention, flash_attention_auto  # noqa: F401
from kuzu.ops.letterbox import letterbox, normalize_image, resize_keep_aspect  # noqa: F401
from kuzu.ops.ctc import ctc_greedy_decode, ctc_loss  # noqa: F401
from kuzu.ops.anchors import dist2bbox, bbox2dist, make_anchors  # noqa: F401
