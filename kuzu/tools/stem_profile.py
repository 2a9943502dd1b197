"""Per-node forward (and backward) profiler for the YOLO graph on device.

Times cumulative graph prefixes (node 0..k) with the tunnel-safe scalar-fetch
method and reports per-node deltas — a finer-grained version of the round-1
stem ablation (PERFORMANCE.md "Forward-time decomposition"). Drives the
kernel-engineering targeting for VERDICT round-2 item 2 (stem MFU) and the
round-5 conv-backward attack (VERDICT r4 item 4): ``grad=1`` times
``jax.grad`` of each prefix w.r.t. the params, so a prefix delta is that
node's fwd + bwd cost (grad-input + grad-filter convs included).

Usage: python -m kuzu.tools.stem_profile [model=yolov12x] [imgsz=640]
       [batch=8] [grad=1] [nodes=0,2,4,8]   # nodes= samples prefixes
       (coarser deltas, far fewer tunnel compiles — grad prefixes compile
       slowly through the remote toolchain)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def profile_nodes(
    model: str = "yolov12x",
    imgsz: int = 640,
    batch: int = 8,
    reps: int = 7,
    upto: int | None = None,
    grad: int = 0,
    nodes: str | None = None,
) -> list[dict]:
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from kuzu.core.cache import enable_compilation_cache
    from kuzu.models.yolo import modules as M
    from kuzu.models.yolo.detector import YoloDetector

    enable_compilation_cache()
    det = YoloDetector(model, nc=1, dtype=jnp.bfloat16, imgsz=imgsz)
    variables = det.init(jax.random.key(0), imgsz=imgsz)
    spec = det.spec

    class Prefix(nn.Module):
        """Run the graph up to (and including) node k, reduce to a scalar."""

        k: int

        @nn.compact
        def __call__(self, x):
            graph = det.module
            # re-execute YoloGraph.__call__ manually, stopping at k
            outputs = {}
            cur = x
            for node in spec.nodes[: self.k + 1]:
                ins = [
                    cur if f == node.index - 1 else outputs[f] for f in node.frm
                ]
                m, a = node.module, node.args
                name = f"n{node.index}_{m}"
                if m == "Conv":
                    cur = M.Conv(a[0], *a[1:], dtype=jnp.bfloat16, name=name)(
                        ins[0], train=False
                    )
                elif m == "DWConv":
                    cur = M.DWConv(a[0], *a[1:], dtype=jnp.bfloat16, name=name)(
                        ins[0], train=False
                    )
                elif m == "C3k2":
                    cur = M.C3k2(
                        a[0], n=node.repeats, c3k=a[1], e=a[2],
                        dtype=jnp.bfloat16, name=name,
                    )(ins[0], False)
                elif m == "C2f":
                    cur = M.C2f(
                        a[0], n=node.repeats, shortcut=a[1],
                        dtype=jnp.bfloat16, name=name,
                    )(ins[0], False)
                elif m == "A2C2f":
                    cur = M.A2C2f(
                        a[0], n=node.repeats, a2=a[1], area=a[2],
                        residual=a[3], mlp_ratio=a[4],
                        dtype=jnp.bfloat16, name=name,
                    )(ins[0], False)
                elif m == "SPPF":
                    cur = M.SPPF(a[0], a[1], dtype=jnp.bfloat16, name=name)(
                        ins[0], train=False
                    )
                elif m == "Upsample":
                    cur = M.upsample2x(ins[0])
                elif m == "Concat":
                    cur = jnp.concatenate(ins, axis=-1)
                elif m == "Detect":
                    feats = M.Detect(
                        nc=spec.nc, ch=tuple(spec.detect_ch),
                        legacy=spec.legacy_head, dtype=jnp.bfloat16, name=name,
                    )(ins, train=False)
                    return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
                if node.index in spec.save:
                    outputs[node.index] = cur
            return jnp.sum(cur.astype(jnp.float32))

    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (batch, imgsz, imgsz, 3)).astype(np.float32)
    )

    # tunnel round-trip
    g0 = jax.jit(lambda x: x.sum())
    float(g0(imgs))
    rts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(g0(imgs))
        rts.append(time.perf_counter() - t0)
    rt = float(np.min(rts))

    n_nodes = len(spec.nodes) if upto is None else min(upto + 1, len(spec.nodes))
    ks = (
        [int(s) for s in str(nodes).split(",")]
        if nodes
        else list(range(n_nodes))
    )
    rows = []
    prev = 0.0
    for k in ks:
        mod = Prefix(k)

        if grad:
            # fwd+bwd of the prefix w.r.t. params: the delta between two
            # sampled prefixes is the enclosed nodes' fwd + grad-input +
            # grad-filter cost (conv backward = two more convs)
            def run(v, x, c, _mod=mod):
                def scalar(p):
                    return _mod.apply({**v, "params": p}, x + c * 1e-30)

                g = jax.grad(scalar)(v["params"])
                return sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(g)
                )
        else:

            def run(v, x, c, _mod=mod):
                return _mod.apply(v, x + c * 1e-30)

        fn = jax.jit(run)
        float(fn(variables, imgs, jnp.float32(0)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(fn(variables, imgs, jnp.float32(i + 1)))
            ts.append(time.perf_counter() - t0)
        cum = max(float(np.min(ts)) - rt, 0.0) * 1e3
        node = spec.nodes[k]
        rows.append(
            {
                "node": k,
                "module": node.module,
                "args": node.args,
                "stride": node.stride,
                "cum_ms": round(cum, 3),
                "delta_ms": round(cum - prev, 3),
            }
        )
        prev = cum
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> None:
    kv = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        kv[k] = int(v) if v.isdigit() else v
    profile_nodes(**kv)


if __name__ == "__main__":
    main()
