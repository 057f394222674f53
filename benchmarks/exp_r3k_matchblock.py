"""Round-3k: db_block sweep for knn2_blockwise at 1M packed rows.

Hypothesis: the measured ~60 ms/pass (35.6 G cmp/s) is NOT the int8
matmul (its v5e floor is ~5 ms) but the HBM round trips of the [Q,
block] int32 distance tile + key arrays that the top-2 reduction reads
back per block (~8.6 GB/pass at any block size IF XLA materializes
them). Small enough blocks let the whole dist tile live in VMEM and the
reduction fuse into the matmul consumer — the experiment is whether XLA
actually does it, and where scan-dispatch overhead takes over.
Hardened protocol (salted queries, chained forced fetch)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.exp_r3_gather import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.ops.match import knn2_blockwise, unpack_bits

    rng = np.random.default_rng(3)
    q_n, m = 2048, 1 << 20
    q_packed = rng.integers(0, 256, (q_n, 61), dtype=np.uint8)
    db_packed = jnp.asarray(
        rng.integers(0, 256, (m, 61), dtype=np.uint8))
    qb0 = jnp.asarray(unpack_bits(q_packed))

    cmp_total = q_n * m
    for block in (2048, 4096, 8192, 16384, 32768, 65536):
        @jax.jit
        def f(qb, salt, block=block):
            # Salt flips a few query bits per iteration (defeats the
            # relay result cache) without changing the workload shape.
            qs = jnp.where(
                (jnp.arange(qb.shape[1])[None, :] == (salt.astype(jnp.int32)
                                                      % qb.shape[1])),
                1 - qb, qb).astype(jnp.int8)
            d0, d1, i0 = knn2_blockwise(qs, db_packed, block)
            return (jnp.sum(d0) + jnp.sum(d1)
                    + jnp.sum(i0.astype(jnp.float32))).astype(jnp.float32)

        ms = bench(lambda s: f(qb0, s), iters=30)
        gcps = cmp_total / (ms * 1e-3) / 1e9
        print(f"  block {block:6d}: {ms:7.2f} ms/pass = {gcps:6.1f} G cmp/s",
              flush=True)


if __name__ == "__main__":
    main()
