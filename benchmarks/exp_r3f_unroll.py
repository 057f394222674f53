"""Round-3f: why is the B=4 linearized gather 8.4x the single-frame
cost? Separate table-size from index-count effects, and test the
per-frame UNROLLED alternative (B gathers, each on its own 33.6 MB
table)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.exp_r3_gather import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, L, H, W, C = 4, 16, 512, 512, 4
    K, S = 2048, 550
    stacks = jnp.asarray(rng.standard_normal((B, L, H, W, C)), jnp.bfloat16)
    lvl = jnp.asarray(rng.integers(0, L, (B, K)), jnp.int32)
    cy = jnp.asarray(rng.integers(0, H, (B, K)), jnp.int32)
    cx = jnp.asarray(rng.integers(0, W, (B, K)), jnp.int32)
    offy = jnp.asarray(rng.integers(-43, 44, (K, S)), jnp.int32)
    offx = jnp.asarray(rng.integers(-43, 44, (K, S)), jnp.int32)

    def coords(salt):
        iy = jnp.clip(cy[:, :, None] + offy[None] + salt.astype(jnp.int32)
                      % 2, 0, H - 1)
        ix = jnp.clip(cx[:, :, None] + offx, 0, W - 1)
        return iy, ix

    # (a) per-frame unrolled gathers: B gathers on single-frame tables.
    @jax.jit
    def unrolled(salt):
        iy, ix = coords(salt)
        acc = jnp.float32(0)
        for b in range(B):
            flat = stacks[b].reshape(L * H * W, C)
            lin = (lvl[b][:, None] * H + iy[b]) * W + ix[b]
            acc = acc + jnp.sum(flat[lin].astype(jnp.float32))
        return acc

    print(f"  unrolled per-frame (B={B} tables): "
          f"{bench(unrolled, iters=20):.2f} ms", flush=True)

    # (b) one single-frame table, 4x the indices (index-count scaling).
    @jax.jit
    def idx4x(salt):
        iy, ix = coords(salt)
        flat = stacks[0].reshape(L * H * W, C)
        lin = (lvl[:, :, None] * H + iy) * W + ix   # [B, K, S] into frame 0
        return jnp.sum(flat[lin].astype(jnp.float32))

    print(f"  one table, {B}x indices: {bench(idx4x, iters=20):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
