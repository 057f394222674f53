"""Round-5 spike: recover the plain 4096/8192 tiled-sweep rows.

The r4 Mosaic double-buffering fix halves the FED strip VMEM budget
whenever the diffusion runs under vmap (tile batches), costing +4%/+12%
on the plain tiled sweep (PERF.md round-4 notes). Candidate recovery:
tile_batch=1 — the singleton batch now bypasses vmap entirely
(detect_and_compute_batch B==1 fast path), so each tile diffuses with
the FULL budget. This spike measures tiled extraction at 4096/8192 for
tile_batch ∈ {1, 4} on the real TPU, salted inputs per rep.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute_tiled


def run(size, tile_batch, reps=3):
    rng = np.random.default_rng(0)
    base = rng.random((size, size), np.float32)
    cfg = AkazeConfig(capacity=8192)
    # warm (compile)
    f = detect_and_compute_tiled(jnp.asarray(base), cfg,
                                 tile_batch=tile_batch)
    jax.block_until_ready(f.keypoints.xy)
    times = []
    for r in range(reps):
        salt = base + np.float32(1e-4 * (r + 1))
        arr = jnp.asarray(salt)
        jax.block_until_ready(arr)
        t0 = time.perf_counter()
        f = detect_and_compute_tiled(arr, cfg, tile_batch=tile_batch)
        # chained fetch defeats the axon relay result cache
        _ = np.asarray(f.keypoints.xy[:4])
        times.append(time.perf_counter() - t0)
    return min(times), int(np.sum(np.asarray(f.keypoints.valid)))


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for size in (4096, 8192):
        for tb in (1, 4):
            t, n = run(size, tb)
            print(f"size={size} tile_batch={tb}: {t*1e3:.0f} ms "
                  f"({n} kp)", flush=True)
