"""Large-DB localization benchmark — BASELINE.json config 4: one frame's
descriptors matched against 1M+ geo-referenced descriptors with tiled
on-chip top-k search (ops.match.knn2_blockwise streaming merge).

Usage: python benchmarks/bench_large_db.py [--db-size 1048576]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db-size", type=int, default=1 << 20)
    ap.add_argument("--queries", type=int, default=2048)
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.ops import match as M

    rng = np.random.default_rng(0)
    q = rng.integers(0, 256, (args.queries, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (args.db_size, 61), dtype=np.uint8)

    qb = jnp.asarray(M.unpack_bits(q))
    dbb = jnp.asarray(M.unpack_bits(db))

    @jax.jit
    def run(qb, dbb):
        return M.knn2_blockwise(qb, dbb, args.block)

    out = run(qb, dbb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(qb, dbb)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters

    comparisons = args.queries * args.db_size
    print(json.dumps({
        "bench": "large_db_knn2",
        "db_size": args.db_size,
        "queries": args.queries,
        "ms": round(dt * 1e3, 2),
        "gcomparisons_per_s": round(comparisons / dt / 1e9, 2),
    }))


if __name__ == "__main__":
    main()
