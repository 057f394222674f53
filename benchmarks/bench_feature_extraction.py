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

    for size in (int(s) for s in args.sizes.split(",")):
        cfg = AkazeConfig(capacity=min(args.capacity, size * size // 16))
        tiled = size > args.tile_threshold
        iters = args.iters if not tiled else max(args.iters // 5, 2)
        if tiled:
            img_np = synth_satellite(size)

            def run():
                # Host-merged tiles: the result is already fetched.
                return detect_and_compute_tiled(
                    img_np, cfg, tile=1024, overlap=64, tile_batch=4)
        else:
            img = jnp.asarray(synth_satellite(size))

            def run():
                out = detect_and_compute(img, cfg)
                jax.block_until_ready(jax.tree_util.tree_leaves(out))
                return out

        out = run()                       # compile + warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run()
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "bench": "akaze_extract",
            "size": size,
            "tiled": tiled,
            "ms": round(dt * 1e3, 3),
            "keypoints": int(out.keypoints.count()),
        }), flush=True)


if __name__ == "__main__":
    main()
