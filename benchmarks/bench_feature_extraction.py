"""AKAZE extraction benchmark vs image size — the reference's divan
workload (benchmarks/benches/feature_extraction.rs:14-45: sizes 128…8192
on a Lanczos-resized satellite image).

Usage: python benchmarks/bench_feature_extraction.py [--sizes 128,256,...]
Prints one JSON line per size.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np


def synth_satellite(n: int, seed: int = 3) -> np.ndarray:
    """Multi-scale synthetic terrain (stands in for Denmark_8192.png,
    which is absent from the reference snapshot — SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((n, n), np.float32)
    scale = n
    while scale >= 8:
        k = max(n // scale, 1)
        noise = rng.standard_normal((k, k)).astype(np.float32)
        img += np.kron(noise, np.ones((scale, scale), np.float32))[:n, :n] \
            * (scale / n)
        scale //= 2
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img


def main():
    ap = argparse.ArgumentParser()
    # Full reference sweep (feature_extraction.rs:14): 128…8192. Sizes
    # above --tile-threshold run the tiled path (one 8192² scale space
    # would exceed HBM; detect_and_compute_tiled docstring).
    ap.add_argument("--sizes", default="128,256,512,1024,2048,4096,8192")
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tile-threshold", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import AkazeConfig
    from cubesat_apds_tpu.ops.features.akaze import (
        detect_and_compute, detect_and_compute_tiled)

    # Unique per process: remote result caches must never replay a
    # previous run's execution (see bench.py "Measurement methodology").
    entropy = np.float32(time.time() % 1000.0)

    # Median host-fetch round trip — subtracted from the per-size loop
    # (one chained fetch per size; at ~200-300 ms tunnel RTT and 10
    # iters the bias would otherwise be ~25 ms/frame at small sizes).
    import jax.numpy as _jnp
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(_jnp.asarray(np.float32(i)) + _jnp.float32(1))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    for size in (int(s) for s in args.sizes.split(",")):
        cfg = AkazeConfig(capacity=min(args.capacity, size * size // 16))
        tiled = size > args.tile_threshold
        iters = args.iters if not tiled else max(args.iters // 5, 2)
        if tiled:
            # ONE upload; per-iteration salting happens on device (the
            # tiled path slices tile batches from the device-resident
            # image — no per-batch host traffic).
            img_dev = jnp.asarray(synth_satellite(size))

            def run(iters, salt0):
                # Device-resident tiled merge (round 3): per-iteration
                # results stay on device; a chained scalar accumulator
                # fetched ONCE forces every execution (the hardened
                # protocol — block_until_ready is a no-op remotely).
                t0 = time.perf_counter()
                acc = None
                out = None
                for i in range(iters):
                    out = detect_and_compute_tiled(
                        img_dev + jnp.float32((salt0 + i) * 1e-7), cfg,
                        tile=1024, overlap=64, tile_batch=4)
                    s = out.keypoints.response.sum()
                    acc = s if acc is None else acc + s
                float(acc)
                return time.perf_counter() - t0 - rtt, out

            # Warmup salt is offset past every timed salt so the relay's
            # cross-process result cache can never serve a timed
            # iteration (same trick as the non-tiled branch).
            run(1, entropy + 10000.0)  # compile + warmup
            dt, out = run(iters, entropy)
            dt /= iters
            n_kp = int(out.keypoints.count())
        else:
            img = jnp.asarray(synth_satellite(size))

            @jax.jit
            def step(f, salt):
                out = detect_and_compute(f + salt * jnp.float32(1e-7), cfg)
                return out, (out.descriptors.astype(jnp.int32).sum()
                             + out.keypoints.response.sum())

            out, acc = step(img, jnp.float32(entropy + 10000.0))
            float(acc)  # compile + warmup incl. fetch
            t0 = time.perf_counter()
            acc_total = None
            for i in range(iters):
                out, acc = step(img, jnp.float32(entropy + i))
                acc_total = acc if acc_total is None else acc_total + acc
            float(acc_total)  # forces every execution
            dt = max(time.perf_counter() - t0 - rtt, 1e-9) / iters
            n_kp = int(out.keypoints.count())
        print(json.dumps({
            "bench": "akaze_extract",
            "size": size,
            "tiled": tiled,
            "ms": round(dt * 1e3, 3),
            "keypoints": n_kp,
        }), flush=True)


if __name__ == "__main__":
    main()
