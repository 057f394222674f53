"""Pallas TPU kernel: per-keypoint patch sampling for orientation + MLDB.

XLA's gather costs ~13 ns/index on v5e (PERF.md "gather wall"); the
903K-sample descriptor stage is its biggest consumer. This kernel
restructures the access per keypoint:

  * the packed level stack is laid out [L·Hmax, Wmax/32, 1, 128] — a
    row of 32 pixels × 4 interleaved channels per 128-lane tile — so
    every DYNAMIC offset (patch row start, column tile) lands on a
    LEADING, untiled dimension (Mosaic requires tile-aligned offsets on
    the last two dims);
  * per keypoint, THREE DMAs fetch the 64-row × 3-column-tile window
    around the keypoint into VMEM (8 keypoints per program, overlapped);
  * samples come from one-hot contractions: row select as an MXU matmul
    per tile, tile+channel select as masked VPU reduces — no scalar
    loads, no vector reshapes.

Exactness: identical nearest-neighbour semantics to the direct gather
(equivalence-tested on TPU). Requires min(level dim) ≥ 64 and level
width a multiple of 32 (true for the 512²+ frames this pipeline
targets); callers fall back to the XLA gather otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_R = 30
ROWS = 64                        # DMA row window (covers the 61 needed)
TILE_PX = 32                     # pixels per 128-lane tile (×4 channels)
N_TILES = 4                      # column tiles per window (128 px ≥ any
                                 # 61-px span after tile0 down-clamping)
CH = 4                           # packed channels (Lt, Lx, Ly, 0)
KP_BLOCK = 8                     # keypoints per program


def _sample_kernel(lvlrow_ref, tile0_ref,                # scalar prefetch
                   p_ref, q_ref, stack_ref,              # inputs
                   out_ref,                              # [B*CH, S] block
                   patches, sems):                       # scratch
    kb = pl.program_id(0)
    S = p_ref.shape[1]

    def dma(b):
        k = kb * KP_BLOCK + b
        return pltpu.make_async_copy(
            stack_ref.at[pl.ds(lvlrow_ref[k], ROWS),
                         pl.ds(tile0_ref[k], N_TILES), 0],
            patches.at[b],
            sems.at[b],
        )

    for b in range(KP_BLOCK):
        dma(b).start()

    # Flat window lane layout: patches[b] viewed [ROWS, N_TILES·128] —
    # global lane of (tile, px, ch) = tile·128 + px·4 + ch. All selection
    # math runs in bf16 (LOSSLESS here: patch values originate as bf16)
    # so the MXU runs at full rate; row sums go through a ones-matmul
    # instead of slow lane-shuffle reductions.
    LANES = N_TILES * TILE_PX * CH
    riota_r = jax.lax.broadcasted_iota(jnp.int32, (S, ROWS), 1)
    # Pixel index per lane (channels interleave every CH lanes).
    pxiota = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 1) // CH
    # Channel separator: E[l, c] = 1{l mod CH == c} — one matmul then
    # splits the masked row into its CH channels.
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, 8), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, 8), 1)
    E = ((l_ids % CH) == c_ids).astype(jnp.bfloat16)      # [LANES, 8]
    for b in range(KP_BLOCK):
        dma(b).wait()
        p = p_ref[b, :]                                  # [S] row in window
        q = q_ref[b, :]                                  # [S] pixel in window
        row_oh = (riota_r == p[:, None]).astype(jnp.bfloat16)   # [S, 64]
        patch_bf = patches[b].reshape(ROWS, LANES).astype(jnp.bfloat16)
        # T[s, l] = patch[p_s, l] — row select on the MXU.
        T = jnp.dot(row_oh, patch_bf,
                    preferred_element_type=jnp.float32)  # [S, LANES]
        T = T.astype(jnp.bfloat16)                        # lossless (one-hot)
        pix_mask = (pxiota == q[:, None]).astype(jnp.bfloat16)
        # red[s, c] = T[s, q_s·CH + c] — all channels in one contraction.
        red = jnp.dot(T * pix_mask, E,
                      preferred_element_type=jnp.float32)  # [S, 8]
        for c in range(CH):
            out_ref[b * CH + c, :] = red[:, c]


@functools.partial(jax.jit, static_argnames=("n_samples",))
def _sample_pallas(stack4d, lvlrow, tile0, p_idx, q_idx, n_samples: int):
    """stack4d: [L·Hmax, Wmax/32, 1, 128] bf16; lvlrow/tile0: [K] int32
    window origins; p_idx/q_idx: [K, S] int32 window-relative sample
    coords. K must be a multiple of KP_BLOCK."""
    K = lvlrow.shape[0]
    assert K % KP_BLOCK == 0, K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec((KP_BLOCK, n_samples), lambda k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP_BLOCK, n_samples), lambda k, *_: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),           # stack in HBM
        ],
        out_specs=pl.BlockSpec(
            (KP_BLOCK * CH, n_samples), lambda k, *_: (k, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KP_BLOCK, ROWS, N_TILES, TILE_PX * CH),
                       stack4d.dtype),
            pltpu.SemaphoreType.DMA((KP_BLOCK,)),
        ],
    )
    out = pl.pallas_call(
        _sample_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K * CH, n_samples), jnp.float32),
    )(lvlrow, tile0, p_idx, q_idx, stack4d)
    # [K*CH, S] → [K, S, CH]
    return out.reshape(K, CH, n_samples).transpose(0, 2, 1)


def pallas_sampler(packed_stack, level_hw, lvl, cx, cy):
    """Build a sample_fn(iy, ix) → [K, S, C] backed by the patch kernel.

    packed_stack: [L, Hmax, Wmax, C] bf16; lvl/cx/cy: [K] keypoint level
    + integer centers in level coordinates.
    """
    L, Hmax, Wmax, C = packed_stack.shape
    assert C == CH and Wmax % TILE_PX == 0
    # f32: Mosaic only lowers the (1, 128)-tiled DMA repack for 32-bit
    # element types (bf16 hits "insertion of minor dim" in the compiler).
    stack4d = packed_stack.astype(jnp.float32).reshape(
        L * Hmax, Wmax // TILE_PX, 1, TILE_PX * CH)
    hs = level_hw[lvl, 0]
    ws = level_hw[lvl, 1]
    # Clamp the window inside the level: rows [row0, row0+64), columns
    # [tile0·32, tile0·32+96). Samples (|offset| ≤ 30 of the center,
    # clipped to the level) always land inside.
    row0 = jnp.clip(cy - PATCH_R, 0, jnp.maximum(hs - ROWS, 0))
    col0 = jnp.clip(cx - PATCH_R, 0, jnp.maximum(ws - (2 * PATCH_R + 1), 0))
    # Down-clamp the tile origin so the N_TILES window stays inside the
    # (padded) stack; the 128-px window still covers [col0, col0+60].
    tile0 = jnp.clip(col0 // TILE_PX, 0, Wmax // TILE_PX - N_TILES)
    lvlrow = lvl.astype(jnp.int32) * Hmax + row0

    def sample_fn(iy, ix):
        S = iy.shape[1]
        p = jnp.clip(jnp.clip(iy, 0, hs[:, None] - 1) - row0[:, None],
                     0, ROWS - 1).astype(jnp.int32)
        q = jnp.clip(jnp.clip(ix, 0, ws[:, None] - 1)
                     - (tile0 * TILE_PX)[:, None],
                     0, N_TILES * TILE_PX - 1).astype(jnp.int32)
        return _sample_pallas(stack4d, lvlrow.astype(jnp.int32),
                              tile0.astype(jnp.int32), p, q, S)

    return sample_fn


def pallas_sampler_supported(level_hw_static) -> bool:
    """Every level ≥ 64 px in both dims and width divisible by 32."""
    arr = np.asarray(level_hw_static)
    return bool((arr >= ROWS).all() and (arr[:, 1] % TILE_PX == 0).all())
