"""Flagship-scale proof harness: yolov12x P2-P5 @640 on real hardware.

The reference's production character detector is yolov12**x** with the P2-P5
head trained at page scale (`yolov12/ultralytics/cfg/models/v12/yolov12x.yaml:29-55`
driven by `scripts/train_character_detection.py:39-99`, incl. the
partial-weight graft from a P3-P5 pretrained model). This tool proves that
configuration end to end on the chip:

- ``bench``    — jitted full train step (fwd + TAL + v8 loss + bwd + opt +
                 EMA + BN stats) at x-scale/640: step ms, img/s, measured
                 MFU, and compiled HBM footprint for a given remat setting.
- ``synth``    — synthetic multi-class "page" dataset: tall columns of small
                 glyph-like boxes, YOLO format on disk.
- ``converge`` — short on-chip convergence run of the flagship config via
                 the real DetectTrainer (P2 head exercised in training).
- ``graft``    — the reference's P2 surgery: pretrain yolov12x (P3-P5)
                 briefly, then start yolov12-p2x from it via partial load
                 (`scripts/train_character_detection.py:41-44`).

Usage: ``python -m kuzu.tools.flagship <cmd> k=v ...``
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

# v5e bf16 peak (spec ~197 TFLOP/s; PERFORMANCE.md calibration measured
# ~200 sustained on amortized 4096-cube matmul chains)
V5E_BF16_PEAK = 197e12


# ------------------------------------------------------------ synthetic data


def synth_pages(
    root: Path,
    n_train: int = 32,
    n_val: int = 8,
    imgsz: int = 640,
    nc: int = 6,
    seed: int = 0,
    max_per_page: int = 120,
) -> Path:
    """Write a synthetic multi-class page set in YOLO format.

    Pages mimic kuzushiji layout: a paper-colored canvas with 3-5 vertical
    columns, each a top-to-bottom run of small glyph-like marks (the shapes
    differ per class so the detector has something to learn). Box sizes
    12-36 px at 640 — P2-head (stride 4) territory.
    """
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(seed)
    palette = [
        (40, 30, 25), (120, 30, 30), (30, 60, 120),
        (30, 100, 40), (110, 70, 20), (80, 30, 100),
        (20, 90, 90), (90, 90, 20),
    ]

    def draw_glyph(d: ImageDraw.ImageDraw, cls: int, x: int, y: int, w: int, h: int):
        c = palette[cls % len(palette)]
        if cls % 4 == 0:
            d.rectangle([x, y, x + w, y + h], outline=c, width=max(2, w // 8))
        elif cls % 4 == 1:
            d.ellipse([x, y, x + w, y + h], fill=c)
        elif cls % 4 == 2:
            d.line([x, y, x + w, y + h], fill=c, width=max(2, w // 6))
            d.line([x + w, y, x, y + h], fill=c, width=max(2, w // 6))
        else:
            d.polygon(
                [(x + w // 2, y), (x + w, y + h), (x, y + h)], fill=c
            )

    root = Path(root)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            bg = 228 + int(rng.integers(0, 18))
            img = Image.new("RGB", (imgsz, imgsz), (bg, bg - 6, bg - 20))
            d = ImageDraw.Draw(img)
            rows: list[str] = []
            n_cols = int(rng.integers(3, 6))
            xs = np.linspace(0.12, 0.88, n_cols) * imgsz
            for cx in xs:
                y = int(rng.integers(20, 60))
                while y < imgsz - 48 and len(rows) < max_per_page:
                    cls = int(rng.integers(0, nc))
                    w = int(rng.integers(12, 36))
                    h = int(rng.integers(12, 36))
                    x = int(cx - w / 2 + rng.integers(-4, 5))
                    x = max(0, min(imgsz - w - 1, x))
                    draw_glyph(d, cls, x, y, w, h)
                    rows.append(
                        f"{cls} {(x + w / 2) / imgsz:.6f} {(y + h / 2) / imgsz:.6f} "
                        f"{w / imgsz:.6f} {h / imgsz:.6f}"
                    )
                    y += h + int(rng.integers(6, 18))
            img.save(root / "images" / split / f"p{i}.jpg", quality=92)
            (root / "labels" / split / f"p{i}.txt").write_text("\n".join(rows))
    import yaml

    spec = {
        "path": ".",
        "train": "images/train",
        "val": "images/val",
        "nc": nc,
        "names": {k: f"glyph{k}" for k in range(nc)},
    }
    yml = root / "dataset.yaml"
    yml.write_text(yaml.safe_dump(spec))
    return yml


# ------------------------------------------------------------ step benchmark


def bench_train_step(
    model: str = "yolov12-p2x",
    imgsz: int = 640,
    batch: int = 8,
    nc: int = 1,
    max_boxes: int = 300,
    remat: bool = True,
    steps: int = 10,
    optimizer: str = "sgd",
    seed: int = 0,
    attn_impl: str = "auto",
    conv_impl: str = "native",
) -> dict:
    """Measure the full jitted train step at flagship scale on the device.

    Timing is tunnel-safe: N steps chain through the donated TrainState and
    one scalar fetch at the end forces the whole chain (see
    .claude/skills/verify/SKILL.md); the ~25 ms round-trip amortizes over N.
    """
    import jax
    import jax.numpy as jnp

    from kuzu.core.config import load_config
    from kuzu.core.train import build_optimizer, init_state, make_train_step
    from kuzu.models.yolo.detector import YoloDetector
    from kuzu.ops.detect_loss import detection_loss

    det = YoloDetector(
        model, nc=nc, dtype=jnp.bfloat16, imgsz=imgsz, remat=remat,
        attn_impl=attn_impl, conv_impl=conv_impl,
    )
    variables = det.init(jax.random.key(seed), imgsz=imgsz)
    model_state = {k: v for k, v in variables.items() if k != "params"}
    n_params = det.param_count(variables)

    def loss_fn(params, mstate, batch_, rng):
        feats, mutated = det.apply(
            {"params": params, **mstate}, batch_["image"], train=True,
            mutable=["batch_stats"],
        )
        total, metrics = detection_loss(
            feats, batch_["gt_labels"], batch_["gt_boxes"], batch_["mask_gt"],
            nc=nc, imgsz=imgsz, strides=tuple(det.strides),
        )
        return total, (metrics, dict(mutated))

    cfg = load_config(None)
    cfg.merge({"optimizer": optimizer, "epochs": 100, "lr0": 0.01})
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = init_state(variables["params"], tx, use_ema=True, model_state=model_state)
    step = make_train_step(loss_fn, tx, ema_decay=0.9999, has_model_state=True)

    rng = np.random.default_rng(seed)
    fake = {
        "image": jnp.asarray(
            rng.random((batch, imgsz, imgsz, 3), np.float32)
        ),
        "gt_labels": jnp.asarray(
            rng.integers(0, nc, (batch, max_boxes)).astype(np.int32)
        ),
        "gt_boxes": jnp.asarray(
            np.sort(rng.random((batch, max_boxes, 2, 2)) * imgsz, axis=2)
            .reshape(batch, max_boxes, 4)[..., [0, 2, 1, 3]]
            .astype(np.float32)
        ),
        "mask_gt": jnp.asarray(
            (np.arange(max_boxes)[None] < 60).repeat(batch, 0)
        ),
    }

    # compiled-program stats: FLOPs + HBM footprint
    rng_key = jax.random.key(0)
    compiled = step.lower(state, fake, rng_key).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", 0.0))
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "hbm_args_gb": ma.argument_size_in_bytes / 2**30,
            "hbm_temp_gb": ma.temp_size_in_bytes / 2**30,
            "hbm_output_gb": ma.output_size_in_bytes / 2**30,
            "hbm_total_gb": (
                ma.argument_size_in_bytes + ma.temp_size_in_bytes
            ) / 2**30,
        }
    except Exception:  # memory_analysis unavailable on some backends
        pass

    # warmup (compile + 2 steps), then timed chains. The first chained run
    # of an executable reads ~80 ms/step high (device/tunnel warmup —
    # PERFORMANCE.md round-4 reproducibility finding), so time several
    # chains of the SAME executable and report the min (steady state).
    for _ in range(2):
        state, metrics = step(state, fake, rng_key)
    float(metrics["loss"])
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            rng_key, sk = jax.random.split(rng_key)
            state, metrics = step(state, fake, sk)
        loss = float(metrics["loss"])  # forces the chain
        dts.append((time.perf_counter() - t0 - 0.025) / steps)
    dt = min(dts)  # steady-state chain, amortized tunnel RT
    out = {
        "model": model,
        "imgsz": imgsz,
        "batch": batch,
        "nc": nc,
        "params_m": n_params / 1e6,
        "remat": remat,
        "conv_impl": conv_impl,
        "step_ms": dt * 1e3,
        "img_per_s": batch / dt,
        "step_tflops": flops / 1e12,
        "mfu": flops / dt / V5E_BF16_PEAK,
        "loss_finite": bool(np.isfinite(loss)),
        **mem,
    }
    return out


# -------------------------------------------------------------------- driver


def _kv(args: list[str]) -> dict:
    out = {}
    for a in args:
        k, _, v = a.partition("=")
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main(argv: list[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return
    cmd, kv = argv[0], _kv(argv[1:])
    if cmd == "synth":
        root = Path(kv.pop("root", "runs/synth_pages"))
        yml = synth_pages(root, **kv)
        print(f"dataset: {yml}")
    elif cmd == "bench":
        res = bench_train_step(**kv)
        print(json.dumps(res, indent=2))
    elif cmd == "converge":
        data = kv.pop("data", None)
        if data is None:
            data = str(synth_pages(Path(kv.pop("root", "runs/synth_pages"))))
            print(f"generated {data}")
        from kuzu.api.model import Model

        m = Model(str(kv.pop("model", "yolov12-p2x")))
        res = m.train(
            data=data,
            imgsz=int(kv.pop("imgsz", 640)),
            dtype="bfloat16",
            **kv,
        )
        print(json.dumps({k: float(v) for k, v in res.items()}, indent=2))
    elif cmd == "graft":
        # stage 1: brief P3-P5 pretrain; stage 2: P2-P5 from the graft
        data = kv.pop("data", None)
        if data is None:
            data = str(synth_pages(Path(kv.pop("root", "runs/synth_pages"))))
        from kuzu.api.model import Model

        pre_epochs = int(kv.pop("pre_epochs", 3))
        base = Model(str(kv.pop("base_model", "yolov12x")))
        base.train(
            data=data, imgsz=int(kv.get("imgsz", 640)), epochs=pre_epochs,
            dtype="bfloat16", name="graft-pre", exist_ok=True,
        )
        pre_dir = str(base._trainer.save_dir / "weights")
        m = Model(str(kv.pop("model", "yolov12-p2x")))
        res = m.train(
            data=data, imgsz=int(kv.pop("imgsz", 640)), dtype="bfloat16",
            pretrained=pre_dir, **kv,
        )
        print(json.dumps({k: float(v) for k, v in res.items()}, indent=2))
    else:
        raise SystemExit(f"unknown command '{cmd}' (synth|bench|converge|graft)")


if __name__ == "__main__":
    main()
