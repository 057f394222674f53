"""Round-3l: fused Pallas kNN-2 matcher vs the XLA scan path.

Correctness on-device (vs knn2_blockwise, moderate M), then timing at
1M/4M packed rows with the hardened salt+chained-fetch protocol.
Sweeps (q_tile, db_block, mxu dtype) to find the kernel's operating
point. Usage: python benchmarks/exp_r3l_pallas_match.py [--quick]
"""

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
    from cubesat_apds_tpu.ops.pallas.match_kernel import knn2_fused, pack_words

    quick = "--quick" in sys.argv
    rng = np.random.default_rng(3)
    q_n = 2048
    q_packed = rng.integers(0, 256, (q_n, 61), dtype=np.uint8)
    qb = jnp.asarray(unpack_bits(q_packed))

    # --- correctness on device (M = 100k, ragged + validity mask) ----
    m_c = 100_000
    dbp_c = rng.integers(0, 256, (m_c, 61), dtype=np.uint8)
    dv_c = rng.random(m_c) > 0.05
    ref = jax.jit(lambda q: knn2_blockwise(
        q, jnp.asarray(dbp_c), 65536, jnp.asarray(dv_c)))(qb)
    for variant in ("sweep", "tile"):
        got = knn2_fused(qb, pack_words(dbp_c), jnp.asarray(dv_c),
                         variant=variant)
        ok = all(np.array_equal(np.asarray(a), np.asarray(b))
                 for a, b in zip(ref, got))
        print(f"correctness @100k (masked, {variant}): "
              f"{'BIT-EXACT' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            for name, a, b in zip(("d0", "d1", "i0"), ref, got):
                a, b = np.asarray(a), np.asarray(b)
                n = int(np.sum(a != b))
                print(f"  {name}: {n} rows differ", flush=True)
            return

    # --- timing ------------------------------------------------------
    for m in ([1 << 20] if quick else [1 << 20, 4 << 20]):
        dbp = rng.integers(0, 256, (m, 61), dtype=np.uint8)
        dw = jax.device_put(pack_words(dbp))
        cmp_total = q_n * m
        print(f"M = {m}:", flush=True)
        for variant, q_tile, db_block, mxu in (
            ("tile", 512, 4096, "int8"),      # round-3 v1 operating point
            ("sweep", 512, 4096, "int8"),
            ("sweep", 256, 4096, "int8"),
            ("sweep", 256, 8192, "int8"),
            ("sweep", 128, 4096, "int8"),
            ("sweep", 256, 2048, "int8"),
        ):
            # NB: the DB is an explicit ARGUMENT — closing over `dw`
            # embeds it as an HLO constant and the axon relay's compile
            # request body then grows with M (HTTP 413 at 256 MB).
            @jax.jit
            def f(q, d, salt, var=variant, qt=q_tile, db=db_block, mx=mxu):
                qs = jnp.where(
                    (jnp.arange(q.shape[1])[None, :]
                     == (salt.astype(jnp.int32) % q.shape[1])),
                    1 - q, q).astype(jnp.int8)
                d0, d1, i0 = knn2_fused(qs, d, q_tile=qt, db_block=db,
                                        mxu=mx, variant=var)
                return (jnp.sum(d0) + jnp.sum(d1)
                        + jnp.sum(i0.astype(jnp.float32))).astype(jnp.float32)

            try:
                ms = bench(lambda s: f(qb, dw, s), iters=30)
            except Exception as e:  # Mosaic lowering may reject a combo
                print(f"  {variant} qt={q_tile} bm={db_block} {mxu}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            gcps = cmp_total / (ms * 1e-3) / 1e9
            print(f"  {variant} qt={q_tile} bm={db_block} {mxu}: "
                  f"{ms:7.2f} ms/pass = {gcps:6.1f} G cmp/s", flush=True)


if __name__ == "__main__":
    main()
