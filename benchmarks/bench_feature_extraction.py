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
    ap.add_argument("--sizes", default="128,256,512,1024,2048")
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import AkazeConfig
    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute

    for size in (int(s) for s in args.sizes.split(",")):
        img = jnp.asarray(synth_satellite(size))
        cfg = AkazeConfig(capacity=min(args.capacity, size * size // 16))
        out = detect_and_compute(img, cfg)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = detect_and_compute(img, cfg)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "bench": "akaze_extract",
            "size": size,
            "ms": round(dt * 1e3, 3),
            "keypoints": int(out.keypoints.count()),
        }), flush=True)


if __name__ == "__main__":
    main()
