"""Round-3e: does the custom-vmap flat_take actually hit the fast
single-dim gather lowering at B=4? Compare: naive vmapped 3D gather,
vmapped flat_take, and a hand-linearized batch gather."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.exp_r3_gather import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.ops.features.flat_gather import flat_take

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
        ix = jnp.clip(cx[:, :, None] + offx[None], 0, W - 1)
        return iy, ix

    @jax.jit
    def naive3d(salt):
        iy, ix = coords(salt)

        def one(stack, lv, iy, ix):
            lvv = jnp.broadcast_to(lv[:, None], iy.shape)
            return jnp.sum(stack[lvv, iy, ix].astype(jnp.float32))
        return jnp.sum(jax.vmap(one)(stacks, lvl, iy, ix))

    print(f"  vmapped 3D gather      : {bench(naive3d, iters=20):.2f} ms",
          flush=True)

    @jax.jit
    def viaflat(salt):
        iy, ix = coords(salt)

        def one(stack, lv, iy, ix):
            flat = stack.reshape(L * H * W, C)
            lin = (lv[:, None] * H + iy) * W + ix
            return jnp.sum(flat_take(flat, lin).astype(jnp.float32))
        return jnp.sum(jax.vmap(one)(stacks, lvl, iy, ix))

    print(f"  vmapped flat_take      : {bench(viaflat, iters=20):.2f} ms",
          flush=True)

    flat_all = stacks.reshape(B * L * H * W, C)

    @jax.jit
    def manual(salt):
        iy, ix = coords(salt)
        lin = ((jnp.arange(B, dtype=jnp.int32)[:, None, None] * L
                + lvl[:, :, None]) * H + iy) * W + ix
        return jnp.sum(flat_all[lin].astype(jnp.float32))

    print(f"  hand-linearized gather : {bench(manual, iters=20):.2f} ms",
          flush=True)

    @jax.jit
    def single(salt):
        iy = jnp.clip(cy[0][:, None] + offy + salt.astype(jnp.int32) % 2,
                      0, H - 1)
        ix = jnp.clip(cx[0][:, None] + offx, 0, W - 1)
        flat = stacks[0].reshape(L * H * W, C)
        lin = (lvl[0][:, None] * H + iy) * W + ix
        return jnp.sum(flat[lin].astype(jnp.float32))

    print(f"  single frame reference : {bench(single, iters=40):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
