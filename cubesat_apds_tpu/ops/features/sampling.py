"""Patch-based keypoint sampling on the MXU (gather-minimal).

TPU gathers cost ~13 ns per INDEX regardless of row width, so the naive
per-sample gather used by orientation + MLDB (2048 kp × 441 samples ≈
1M indices) is latency-bound at ~8 ms/frame. This module restructures
sampling to be index-frugal and MXU-heavy:

  1. ONE row gather pulls each keypoint's 61-row band from the packed
     level stack (61 indices/keypoint instead of 441+);
  2. a one-hot einsum crops the 61 columns around the keypoint
     (contraction on the MXU — effectively a batched gather-as-matmul);
  3. per-sample values come from two more one-hot einsums against the
     61×61 patch (row select, then column select).

Semantics are EXACTLY the nearest-neighbour sampling of the direct
gather (the one-hots encode the same clipped integer indices), verified
by equivalence tests. Patch radius 30 covers the MLDB extent
10·√2·s ≤ 28.3 for the s ≤ 2 scales AKAZE's 4-sublevel config produces,
and the orientation disc (12·s ≤ 24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PATCH_R = 30
PATCH = 2 * PATCH_R + 1  # 61


def _fround(x):
    return jnp.floor(x + 0.5).astype(jnp.int32)


def extract_patches(packed_stack, level_hw, lvl, cx, cy, chunk: int = 1024):
    """Per-keypoint 61×61×C patches from the [L, H, W, C] packed stack.

    lvl, cx, cy: [K] int32 level index + integer center (level coords).
    Returns (patches [K, 61, 61, C], col0 [K] first image column of the
    patch, row0 [K] first image row). Out-of-range rows/cols clamp to the
    image edge (duplicated), matching per-sample clipping.
    """
    L, Hmax, Wmax, C = packed_stack.shape
    K = lvl.shape[0]
    rows_flat = packed_stack.reshape(L * Hmax, Wmax * C)

    hs = level_hw[lvl, 0]                                  # [K]
    ws = level_hw[lvl, 1]
    row0 = cy - PATCH_R
    col0 = cx - PATCH_R

    r_off = jnp.arange(PATCH, dtype=jnp.int32)
    row_ids = jnp.clip(row0[:, None] + r_off[None, :], 0,
                       hs[:, None] - 1) + lvl[:, None] * Hmax  # [K, 61]

    xiota = jnp.arange(Wmax, dtype=jnp.int32)

    def do_chunk(args):
        row_ids_c, col0_c, ws_c = args
        rows = rows_flat[row_ids_c]                        # [k, 61, W*C]
        rows = rows.reshape(rows.shape[0], PATCH, Wmax, C)
        col_ids = jnp.clip(col0_c[:, None] + r_off[None, :], 0,
                           ws_c[:, None] - 1)              # [k, 61]
        col_oh = (xiota[None, None, :] == col_ids[:, :, None]
                  ).astype(rows.dtype)                     # [k, 61, W]
        # patch[k, r, c, d] = Σ_x rows[k, r, x, d] · col_oh[k, c, x]
        return jax.lax.dot_general(
            rows, col_oh,
            dimension_numbers=((( 2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(rows.dtype).transpose(0, 1, 3, 2)         # [k,61,61,C]?

    # dot_general output dims: batch k, lhs free (r, d), rhs free (c)
    # → [k, r, d, c]; transpose to [k, r, c, d].

    if K <= chunk:
        patches = do_chunk((row_ids, col0, ws))
    else:
        n_chunks = -(-K // chunk)
        pad = n_chunks * chunk - K
        ri = jnp.pad(row_ids, ((0, pad), (0, 0)))
        c0 = jnp.pad(col0, (0, pad))
        wsp = jnp.pad(ws, (0, pad), constant_values=1)
        patches = jax.lax.map(
            do_chunk,
            (ri.reshape(n_chunks, chunk, PATCH),
             c0.reshape(n_chunks, chunk),
             wsp.reshape(n_chunks, chunk)))
        patches = patches.reshape(n_chunks * chunk, PATCH, PATCH,
                                  packed_stack.shape[-1])[:K]
    return patches, col0, row0


def sample_patches(patches, iy, ix, row0, col0, level_hw, lvl):
    """Nearest-neighbour samples from patches at image coords (iy, ix).

    patches: [K, 61, 61, C]; iy, ix: [K, S] int32 image-coordinate sample
    positions (pre-clip); returns [K, S, C] float32. Encodes the same
    clip-to-image behavior as direct gathering.
    """
    hs = level_hw[lvl, 0][:, None]
    ws = level_hw[lvl, 1][:, None]
    p = jnp.clip(jnp.clip(iy, 0, hs - 1) - row0[:, None], 0, PATCH - 1)
    q = jnp.clip(jnp.clip(ix, 0, ws - 1) - col0[:, None], 0, PATCH - 1)

    riota = jnp.arange(PATCH, dtype=jnp.int32)
    row_oh = (riota[None, None, :] == p[:, :, None]).astype(patches.dtype)
    col_oh = (riota[None, None, :] == q[:, :, None]).astype(patches.dtype)

    # T[k, s, c, d] = Σ_r row_oh[k, s, r] · patches[k, r, c, d]
    T = jax.lax.dot_general(
        row_oh, patches.reshape(patches.shape[0], PATCH, -1),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                       # [k, S, 61*C]
    C = patches.shape[-1]
    T = T.reshape(T.shape[0], T.shape[1], PATCH, C)
    # samples[k, s, d] = Σ_c col_oh[k, s, c] · T[k, s, c, d]
    out = jnp.sum(col_oh[..., None].astype(jnp.float32) * T, axis=-2)
    return out
