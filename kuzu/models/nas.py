"""YOLO-NAS family: TPU-native re-parameterizable detector.

Capability parity with the reference NAS family
(``yolov12/ultralytics/models/nas/model.py:49-94``,
``predict.py:35-57``, ``val.py:38-50``): a detection model whose eval
forward yields *decoded* (xyxy boxes, class scores) — the
super_gradients output contract — with predictor/validator doing only
xyxy2xywh + NMS postprocess.

The reference wraps Deci's pretrained super_gradients network and
explicitly refuses to build from YAML ("YOLO-NAS models only support
pre-trained models", ``model.py:49``); its pretrained-download path is
closed in this zero-egress environment. kuzu therefore ships the
architecture itself — QARepVGG re-parameterizable blocks, CSP stages,
SPPF, a PAN neck and a decoupled DFL head — so the family is buildable
AND trainable with the standard detect machinery (the searched
micro-architecture cannot be reproduced without the NAS run, so stage
depths/widths are hand-scaled s/m/l approximations; our param counts
are pinned in tests/test_nas.py as regression anchors, not as parity
with Deci's published counts).

TPU notes: QARepVGG trains with three branches (3x3+BN, raw 1x1,
identity; post-add BN — the quantization-friendly "B" layout) and
re-parameterizes at inference into ONE 3x3 conv + bias: the algebra
runs in-graph over the weight tensors (O(params) elementwise, fused by
XLA into the conv's prologue), so a single checkpoint serves both
paths and the inference graph runs one MXU conv per block instead of
two convs + two BNs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kuzu.models.yolo.modules import SPPF, Conv, dfl_expectation, upsample2x
from kuzu.ops.anchors import dist2bbox, make_anchors

Dtype = Any

_BN_EPS = 1e-3
_BN_MOMENTUM = 0.97

# size -> (width multiple, per-stage CSP depths)
_SIZES = {
    "s": (0.50, (1, 1, 2, 1)),
    "m": (0.75, (2, 2, 3, 2)),
    "l": (1.00, (2, 3, 4, 2)),
}
_BASE_CH = (64, 128, 256, 512, 768)


def _mult16(c: float) -> int:
    """Round channels to a multiple of 16 (TPU sublane-friendly)."""
    return max(16, int(round(c / 16)) * 16)


class QARepVGG(nn.Module):
    """Quantization-aware RepVGG block (QARepVGG-B layout).

    Train structure: ``relu(BN(BN3(conv3x3(x)) + conv1x1(x) [+ x]))`` —
    BN on the 3x3 branch only, raw 1x1 and identity, one BN after the
    add. Eval with ``fuse=True`` re-parameterizes all of it into a
    single 3x3 conv + bias (see module docstring). Both paths share one
    parameter tree.
    """

    co: int
    stride: int = 1
    fuse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ci = x.shape[-1]
        co = self.co
        has_id = self.stride == 1 and ci == co
        w3 = self.param(
            "w3", nn.initializers.he_normal(), (3, 3, ci, co), jnp.float32
        )
        w1 = self.param(
            "w1", nn.initializers.he_normal(), (1, 1, ci, co), jnp.float32
        )
        # branch-3 BN then post-add BN (scale/bias are params, running
        # mean/var live in the batch_stats collection like flax's own BN)
        g3 = self.param("bn3_scale", nn.initializers.ones, (co,), jnp.float32)
        b3 = self.param("bn3_bias", nn.initializers.zeros, (co,), jnp.float32)
        g = self.param("bn_scale", nn.initializers.ones, (co,), jnp.float32)
        b = self.param("bn_bias", nn.initializers.zeros, (co,), jnp.float32)
        m3 = self.variable(
            "batch_stats", "bn3_mean", lambda: jnp.zeros((co,), jnp.float32)
        )
        v3 = self.variable(
            "batch_stats", "bn3_var", lambda: jnp.ones((co,), jnp.float32)
        )
        m = self.variable(
            "batch_stats", "bn_mean", lambda: jnp.zeros((co,), jnp.float32)
        )
        v = self.variable(
            "batch_stats", "bn_var", lambda: jnp.ones((co,), jnp.float32)
        )

        def conv(inp, k, pad):
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype),
                k.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if not train and self.fuse:
            # fold branch-3 BN into w3 (running stats; eval only)
            s3 = g3 * jax.lax.rsqrt(v3.value + _BN_EPS)
            k = w3 * s3 + jnp.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0)))
            bias = b3 - m3.value * s3
            if has_id:
                k = k.at[1, 1].add(jnp.eye(ci, dtype=k.dtype))
            # post-add BN folds onto the equivalent conv
            s = g * jax.lax.rsqrt(v.value + _BN_EPS)
            k = k * s
            bias = (bias - m.value) * s + b
            return nn.relu(conv(x, k, 1) + bias.astype(self.dtype))

        y3 = conv(x, w3, 1).astype(jnp.float32)
        if train:
            mu3 = y3.mean(axis=(0, 1, 2))
            var3 = y3.var(axis=(0, 1, 2))
            m3.value = _BN_MOMENTUM * m3.value + (1 - _BN_MOMENTUM) * mu3
            v3.value = _BN_MOMENTUM * v3.value + (1 - _BN_MOMENTUM) * var3
        else:
            mu3, var3 = m3.value, v3.value
        y3 = (y3 - mu3) * jax.lax.rsqrt(var3 + _BN_EPS) * g3 + b3
        y = y3 + conv(x, w1, 0).astype(jnp.float32)
        if has_id:
            y = y + x.astype(jnp.float32)
        if train:
            mu = y.mean(axis=(0, 1, 2))
            var = y.var(axis=(0, 1, 2))
            m.value = _BN_MOMENTUM * m.value + (1 - _BN_MOMENTUM) * mu
            v.value = _BN_MOMENTUM * v.value + (1 - _BN_MOMENTUM) * var
        else:
            mu, var = m.value, v.value
        y = (y - mu) * jax.lax.rsqrt(var + _BN_EPS) * g + b
        return nn.relu(y).astype(self.dtype)


class NASStage(nn.Module):
    """CSP stage over QARepVGG bottlenecks (YoloNASCSPLayer shape):
    split 1x1 a/b, run ``n`` blocks on a, concat, 1x1 out."""

    co: int
    n: int = 1
    fuse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = self.co // 2
        a = Conv(c_, 1, dtype=self.dtype, name="cva")(x, train=train)
        b = Conv(c_, 1, dtype=self.dtype, name="cvb")(x, train=train)
        for i in range(self.n):
            a = QARepVGG(c_, fuse=self.fuse, dtype=self.dtype, name=f"m{i}")(
                a, train=train
            )
        return Conv(self.co, 1, dtype=self.dtype, name="cvo")(
            jnp.concatenate([a, b], axis=-1), train=train
        )


class YoloNAS(nn.Module):
    """QARepVGG backbone + PAN neck + decoupled DFL head.

    Forward returns per-level raw maps (B, H, W, 4*reg_max + nc) at
    strides 8/16/32 — the same contract as the graph Detect head, so
    ``kuzu.ops.detect_loss.detection_loss`` trains it unchanged.
    """

    nc: int = 80
    size: str = "s"
    reg_max: int = 16
    fuse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        from kuzu.ops.images import from_uint8

        x = from_uint8(x, dtype=self.dtype)  # raw uint8 normalizes on-device
        wm, depths = _SIZES[self.size]
        ch = [_mult16(c * wm) for c in _BASE_CH]
        kw = dict(fuse=self.fuse, dtype=self.dtype)

        x = QARepVGG(ch[0], stride=2, name="stem", **kw)(x, train=train)
        feats = []
        for i, (c, n) in enumerate(zip(ch[1:], depths)):
            x = QARepVGG(c, stride=2, name=f"down{i}", **kw)(x, train=train)
            x = NASStage(c, n=n, name=f"stage{i}", **kw)(x, train=train)
            if i >= 1:
                feats.append(x)
        p3, p4, p5 = feats
        p5 = SPPF(ch[4], dtype=self.dtype, name="sppf")(p5, train=train)

        # PAN: top-down then bottom-up (strides 8/16/32 out)
        r5 = Conv(ch[3], 1, dtype=self.dtype, name="red5")(p5, train=train)
        u4 = NASStage(ch[3], n=depths[2], name="up4", **kw)(
            jnp.concatenate([upsample2x(r5), p4], axis=-1), train=train
        )
        r4 = Conv(ch[2], 1, dtype=self.dtype, name="red4")(u4, train=train)
        n3 = NASStage(ch[2], n=depths[1], name="up3", **kw)(
            jnp.concatenate([upsample2x(r4), p3], axis=-1), train=train
        )
        d3 = QARepVGG(ch[2], stride=2, name="dn3", **kw)(n3, train=train)
        n4 = NASStage(ch[3], n=depths[1], name="dn4", **kw)(
            jnp.concatenate([d3, u4], axis=-1), train=train
        )
        d4 = QARepVGG(ch[3], stride=2, name="dn5", **kw)(n4, train=train)
        n5 = NASStage(ch[4], n=depths[1], name="dn6", **kw)(
            jnp.concatenate([d4, p5], axis=-1), train=train
        )

        outs = []
        for i, t in enumerate((n3, n4, n5)):
            s = Conv(max(t.shape[-1] // 2, 64), 1, dtype=self.dtype,
                     name=f"h{i}_stem")(t, train=train)
            r = Conv(s.shape[-1], 3, dtype=self.dtype, name=f"h{i}_reg")(
                s, train=train
            )
            r = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype,
                        name=f"h{i}_reg_out")(r)
            c = Conv(s.shape[-1], 3, dtype=self.dtype, name=f"h{i}_cls")(
                s, train=train
            )
            c = nn.Conv(self.nc, (1, 1), dtype=self.dtype,
                        name=f"h{i}_cls_out")(c)
            outs.append(jnp.concatenate([r, c], axis=-1))
        return outs


@dataclasses.dataclass
class NASSpec:
    """Duck-typed GraphSpec surface the detect task machinery reads."""

    nc: int
    reg_max: int = 16
    strides: tuple = (8, 16, 32)
    end2end: bool = False
    classify: bool = False
    obb: bool = False
    kpt_shape: tuple | None = None
    seg_nm: int = 0
    legacy_head: bool = True


class NASDetector:
    """YoloDetector-protocol wrapper so DetectTrainer/Predictor reuse.

    ``infer`` runs the re-parameterized (fused) module — the NAS
    analogue of the graph executor's BN-folded fast path.
    """

    def __init__(
        self,
        model: str = "yolo_nas_s",
        nc: int | None = None,
        dtype: Any = jnp.float32,
        imgsz: int = 640,
        reg_max: int | None = None,
        **_: Any,
    ):
        size = str(model).replace("yolo_nas_", "").replace("yolo_nas", "") or "s"
        if size not in _SIZES:
            raise ValueError(
                f"unknown YOLO-NAS size {model!r} (sizes: {sorted(_SIZES)})"
            )
        self.spec = NASSpec(nc=int(nc or 80), reg_max=int(reg_max or 16))
        self.nc = self.spec.nc
        self.strides = list(self.spec.strides)
        self.imgsz = imgsz
        kw = dict(nc=self.nc, size=size, reg_max=self.spec.reg_max, dtype=dtype)
        self.module = YoloNAS(fuse=False, **kw)
        self._fused = YoloNAS(fuse=True, **kw)

    def init(self, rng: jax.Array, imgsz: int | None = None) -> dict:
        s = imgsz or self.imgsz
        dummy = jnp.zeros((1, s, s, 3), jnp.float32)
        return jax.jit(lambda r: self.module.init(r, dummy, train=False))(rng)

    def apply(self, variables, images, train=False, mutable=False, rngs=None):
        return self.module.apply(
            variables, images, train=train, mutable=mutable, rngs=rngs
        )

    def infer(self, variables, images):
        return self._fused.apply(variables, images, train=False)

    def decode(self, feats, imgsz: int | None = None) -> jnp.ndarray:
        """Raw maps -> (B, 4+nc, A) xywh + sigmoid scores (the NMS
        contract, identical to ``YoloDetector.decode``)."""
        rm = self.spec.reg_max
        flat = [f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats]
        cat = jnp.concatenate(flat, axis=1)
        box_dist, cls = cat[..., : 4 * rm], cat[..., 4 * rm:]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_t = make_anchors(shapes, self.strides)
        dist = dfl_expectation(box_dist, rm)
        boxes = dist2bbox(dist, anchor_points[None], xywh=True) * stride_t[None]
        pred = jnp.concatenate(
            [boxes, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1
        )
        return jnp.transpose(pred, (0, 2, 1))

    def decoded(self, variables, images) -> tuple[jnp.ndarray, jnp.ndarray]:
        """The super_gradients eval-forward contract the reference wraps
        (``nas/model.py:63-70``): (xyxy boxes (B, A, 4), scores (B, A, nc))."""
        pred = self.decode(self.infer(variables, images))  # (B, 4+nc, A)
        pred = jnp.transpose(pred, (0, 2, 1))
        xywh, scores = pred[..., :4], pred[..., 4:]
        half = xywh[..., 2:] / 2
        xyxy = jnp.concatenate([xywh[..., :2] - half, xywh[..., :2] + half], -1)
        return xyxy, scores

    def param_count(self, variables: dict) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def register():
    """Register the 'nas' task: the reference maps NAS to detect-task
    predictor/validator only (``nas/model.py:92-94`` task_map; training
    is unsupported upstream) — kuzu additionally makes it trainable by
    routing the detect trainer onto ``NASDetector``."""
    from kuzu.api.model import register_task
    from kuzu.tasks.detect import DetectPredictor, DetectTrainer, DetectValidator

    class NASTrainer(DetectTrainer):
        detector_cls = NASDetector

    class NASValidator(DetectValidator):
        trainer_cls = NASTrainer

    class NASPredictor(DetectPredictor):
        detector_cls = NASDetector

    register_task(
        "nas",
        trainer=NASTrainer,
        validator=NASValidator,
        predictor=NASPredictor,
    )


register()
