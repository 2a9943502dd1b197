"""Benchmark entry: prints ONE JSON line with the headline metric.

Current flagship benchmark: SimpleViT glyph-classifier training throughput
(images/sec) on the available accelerator. ``vs_baseline`` is the speedup vs
a single-threaded CPU run of the same jitted step — a stand-in for the
reference's unpublished kuzushiji numbers (BASELINE.md: the north star is
end-to-end pages/sec vs CPU reference). Will switch to the YOLOv12 detect
cascade once the detector lands.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _throughput(device_kind: str, batch: int = 64, iters: int = 20) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from kuzu.core.config import load_config
    from kuzu.core.train import build_optimizer, init_state, make_train_step
    from kuzu.models.simple_vit import SimpleViT

    model = SimpleViT(
        num_classes=4000,  # kuzushiji-scale vocab
        image_size=(128, 128),
        patch_size=(16, 16),
        dim=256,
        depth=6,
        num_heads=8,
        dtype=jnp.bfloat16 if device_kind != "cpu" else jnp.float32,
    )
    rng = jax.random.key(0)
    sample = jnp.zeros((1, 128, 128, 1), jnp.float32)
    params = model.init(rng, sample)["params"]

    def loss_fn(p, b, r):
        logits = model.apply({"params": p}, b["image"], train=True, rngs={"dropout": r})
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, b["label"]).mean()
        return loss, {}

    cfg = load_config(overrides=["lr0=0.01", "epochs=1", "optimizer=sgd"])
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = init_state(params, tx, use_ema=True)
    step = make_train_step(loss_fn, tx, mesh=None)

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, 128, 128, 1)).astype(np.float32)
    )
    y = jnp.asarray(np.arange(batch, dtype=np.int32) % 4000)
    b = {"image": x, "label": y}
    # warmup/compile
    state, m = step(state, b, rng)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, b, jax.random.key(i))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main() -> None:
    import jax

    kind = jax.devices()[0].platform
    tpu_tput = _throughput(kind)

    # CPU reference run of the same step (small iter count; fp32)
    import subprocess
    import sys

    cpu_tput = None
    try:
        out = subprocess.run(
            [sys.executable, "-c", (
                "import jax; jax.config.update('jax_platforms','cpu');"
                "import bench; print('CPU_TPUT', bench._throughput('cpu', batch=16, iters=3))"
            )],
            capture_output=True,
            text=True,
            timeout=900,
            cwd=__import__("pathlib").Path(__file__).resolve().parent,
        )
        for line in out.stdout.splitlines():
            if line.startswith("CPU_TPUT"):
                cpu_tput = float(line.split()[1])
    except Exception:
        pass

    vs = (tpu_tput / cpu_tput) if cpu_tput else 1.0
    print(
        json.dumps(
            {
                "metric": "simplevit_train_images_per_sec",
                "value": round(tpu_tput, 2),
                "unit": "images/sec",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
