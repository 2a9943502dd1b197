"""Measure tunnel host->device transfer bandwidth (informs whether
on-device tiling — ship each page once, derive char tiles on device — is
worth building: the tiled cascade ships ~59 MB of pages for column det
PLUS ~59 MB of tiles for char det per 12-page batch).

Method per the timing discipline (SKILL.md): a jitted checksum whose
input is the shipped array; scalar fetch forces execution; subtract the
fixed round-trip; the put itself is timed by device_put + checksum fetch
vs checksum on an already-resident array."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def rt_ms(reps=15):
    x = jnp.ones((128, 128), jnp.bfloat16)
    g = jax.jit(lambda x: x.sum())
    float(g(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)) * 1e3


def main():
    out = {"backend": jax.default_backend(), "roundtrip_ms": rt_ms()}
    g = jax.jit(lambda x: x.astype(jnp.float32).sum())
    for name, shape in (
        ("tiles_48x640", (48, 640, 640, 3)),  # 12 pages x 4 tiles, uint8
        ("pages_12x1280", (12, 1280, 1280, 3)),
        ("crops_512x1024x64", (512, 1024, 64, 3)),
    ):
        host = np.random.default_rng(0).integers(0, 255, shape, np.uint8)
        dev = jax.device_put(host)
        float(g(dev))  # compile + warm
        # resident: checksum only
        t0 = time.perf_counter()
        float(g(dev))
        resident = time.perf_counter() - t0
        # ship fresh each reps (new buffer each time; the tunnel client
        # retains them — keep reps small)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(jax.device_put(host)))
            ts.append(time.perf_counter() - t0)
        ship = min(ts)
        mb = host.nbytes / 1e6
        bw = mb / max(ship - resident, 1e-9)
        out[name] = {
            "mb": round(mb, 1),
            "ship_s": round(ship, 4),
            "resident_s": round(resident, 4),
            "mb_per_s": round(bw, 1),
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
