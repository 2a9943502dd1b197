"""Detector wrapper: graph forward + anchor-free decode (DFL -> boxes).

Splits the reference ``Detect._inference`` (``nn/modules/head.py:98-137``)
out of the head so train and inference share one graph forward:
- ``forward`` returns per-level raw maps (B, H, W, 4*reg_max + nc);
- ``decode`` flattens levels, applies DFL expectation and ``dist2bbox`` with
  static anchors/strides, sigmoid on class logits, producing the
  (B, 4 + nc, A) tensor ``kuzu.ops.nms.non_max_suppression`` consumes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from kuzu.models.yolo.graph import (
    GraphSpec,
    YoloGraph,
    parse_model_yaml,
    resolve_model_spec,
)
from kuzu.models.yolo.modules import dfl_expectation
from kuzu.ops.anchors import dist2bbox, make_anchors

REG_MAX = 16


class YoloDetector:
    """Stateless convenience wrapper bundling spec + flax module."""

    def __init__(
        self,
        model: str | GraphSpec,
        nc: int | None = None,
        dtype: Any = jnp.float32,
        imgsz: int = 640,
        remat: bool = False,
        attn_impl: str = "auto",
        reg_max: int | None = None,
        conv_impl: str = "native",
    ):
        if isinstance(model, GraphSpec):
            self.spec = model
        else:
            path, scale = resolve_model_spec(str(model))
            self.spec = parse_model_yaml(path, scale=scale, nc=nc)
        if reg_max is not None:  # trainer-cfg override of the DFL range
            self.spec.reg_max = int(reg_max)
        if attn_impl == "auto":
            # fused Pallas area attention on TPU in BOTH directions
            # ('flash_train': kernel forward + VMEM flash backward — 195 vs
            # 330 ms/step einsum at flagship scale, in-process A/B, round 3);
            # einsum elsewhere (the kernels are TPU-only)
            attn_impl = (
                "flash_train" if jax.default_backend() == "tpu" else "einsum"
            )
        self.module = YoloGraph(
            self.spec, dtype=dtype, remat=remat, attn_impl=attn_impl,
            conv_impl=conv_impl,
        )
        self.imgsz = imgsz
        self.strides = list(self.spec.strides)
        self.nc = self.spec.nc

    # ------------------------------------------------------------ lifecycle
    def init(self, rng: jax.Array, imgsz: int | None = None) -> dict:
        s = imgsz or self.imgsz
        dummy = jnp.zeros((1, s, s, 3), jnp.float32)
        # jit the whole init: one XLA program instead of thousands of tiny
        # device ops (critical on remote/tunneled devices)
        return jax.jit(lambda r: self.module.init(r, dummy, train=False))(rng)

    def apply(
        self,
        variables: dict,
        images: jnp.ndarray,
        train: bool = False,
        mutable: list | bool = False,
        rngs: dict | None = None,
    ):
        return self.module.apply(
            variables, images, train=train, mutable=mutable, rngs=rngs
        )

    def infer(self, variables: dict, images: jnp.ndarray):
        """Inference forward on the fastest available path.

        On TPU: the fused functional executor (BN folded into conv weights,
        Pallas area attention — ``kuzu.models.yolo.infer.run_graph``), the
        analogue of the reference's ``BaseModel.fuse()`` inference surgery.
        Elsewhere: the plain flax apply. The two paths are keep-set equal
        after decode+NMS (asserted on-chip, PERFORMANCE.md); raw maps agree
        to bf16 rounding only, since BN folding reassociates conv(x,w)*s
        into conv(x, w*s).
        """
        if jax.default_backend() == "tpu":
            from kuzu.models.yolo.infer import run_graph

            # stem_s2d defaults OFF since round 5: the in-process slope A/B
            # (r5_stem_ab.py) measured plain 2.521 / s2d 2.656 / packed
            # 2.588 ms/img e2e — the r4 s2d win did not survive the
            # batched-NMS + estimator changes.
            return run_graph(
                self.spec, variables, images,
                stem_s2d=getattr(self, "stem_s2d", False),
            )
        return self.apply(variables, images, train=False)

    # ------------------------------------------------------------- helpers
    def feat_shapes(self, imgsz: int) -> list[tuple[int, int]]:
        return [(imgsz // s, imgsz // s) for s in self.strides]

    def anchors(self, imgsz: int) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(anchor_points (A, 2) grid units, strides (A, 1))."""
        return make_anchors(self.feat_shapes(imgsz), self.strides)

    def flatten_feats(
        self, feats: list[jnp.ndarray]
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-level maps -> (box_dist (B, A, 4*reg_max), cls (B, A, nc))."""
        flat = []
        for f in feats:
            b, h, w, c = f.shape
            flat.append(f.reshape(b, h * w, c))
        cat = jnp.concatenate(flat, axis=1)
        rm = self.spec.reg_max
        return cat[..., : 4 * rm], cat[..., 4 * rm :]

    def decode(
        self, feats, imgsz: int | None = None
    ) -> jnp.ndarray:
        """Raw maps -> (B, 4 + nc, A): xywh pixel boxes + sigmoid scores.

        Anchor grids derive from the actual per-level map shapes, so
        non-square (rect-batched) inputs decode correctly; ``imgsz`` is
        accepted for API compatibility only."""
        if isinstance(feats, dict):
            if "one2one" in feats:  # v10 dual head: inference = one2one
                feats = feats["one2one"]
            else:  # Segment: detect maps ride under 'det'
                feats = feats["det"]
        box_dist, cls = self.flatten_feats(feats)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_t = make_anchors(shapes, self.strides)
        dist = dfl_expectation(box_dist, self.spec.reg_max)  # (B, A, 4)
        boxes = dist2bbox(dist, anchor_points[None], xywh=True) * stride_t[None]
        pred = jnp.concatenate(
            [boxes, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1
        )
        return jnp.transpose(pred, (0, 2, 1))

    def param_count(self, variables: dict) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
