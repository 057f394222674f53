"""AKAZE dominant-orientation assignment, batched over keypoints.

Replicates the SURF-style Compute_Main_Orientation of AKAZE: gaussian-
weighted first derivatives sampled on a radius-6 disc (step = keypoint
scale), then a sliding 60° angular window (42 starts of 0.15 rad); the
window with the largest resultant vector gives the angle.

TPU shape: the per-keypoint sample disc is a static 109-point pattern, so
orientation for ALL keypoints is a [K, 109] gather + one [K, 42, 109]
masked reduction — no loops over keypoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Static disc pattern: (i, j) with i² + j² < 36.
_DISC = np.array([(i, j) for i in range(-6, 7) for j in range(-6, 7)
                  if i * i + j * j < 36], np.int32)          # [109, 2]
_GAUSS_W = np.exp(-(_DISC[:, 0] ** 2 + _DISC[:, 1] ** 2) / (2.0 * 2.5 ** 2)
                  ).astype(np.float32)                        # σ = 2.5
# Fast mode: checkerboard half of the disc (55 points) — halves the
# per-keypoint gather count (the dominant remaining gather, PERF.md)
# while keeping isotropic coverage; the resultant-vector estimate just
# gets √2 more sampling noise. End-task impact is measured by the
# fast-vs-exact parity study.
_FAST_SEL = ((_DISC[:, 0] + _DISC[:, 1]) % 2 == 0)
_DISC_FAST = _DISC[_FAST_SEL]                                 # [55, 2]
_GAUSS_W_FAST = _GAUSS_W[_FAST_SEL]
_N_WINDOWS = 42
_WINDOW_STARTS = (np.arange(_N_WINDOWS) * 0.15).astype(np.float32)


def _fround(x):
    """OpenCV fRound: round half away from zero (positive domain here)."""
    return jnp.floor(x + 0.5).astype(jnp.int32)


def orientation_sample_coords(xy, size, class_id, octave, mode="exact"):
    """Integer sample coordinates (iy, ix) [K, S] of the orientation
    disc (S=109 exact / 55 fast), in level coordinates (pre-clip)."""
    ratio = jnp.exp2(octave.astype(jnp.float32))
    s = _fround(0.5 * size / ratio).astype(jnp.float32)       # [K]
    xf = xy[:, 0] / ratio
    yf = xy[:, 1] / ratio
    pattern = _DISC_FAST if mode == "fast" else _DISC
    disc = jnp.asarray(pattern, jnp.float32)                  # [S, 2]
    ix = _fround(xf[:, None] + disc[None, :, 0] * s[:, None])  # [K, S]
    iy = _fround(yf[:, None] + disc[None, :, 1] * s[:, None])
    return iy, ix


def gather_sampler(packed_stack, level_hw, lvl):
    """Direct point-gather sampler: (iy, ix) [K, S] → [K, S, C] f32.

    The gather runs on the FLATTENED [L·H·W, C] stack with one
    linearized index per sample: XLA:TPU lowers a single-dimension
    gather ~2.6× faster than the equivalent 3-index gather (measured
    13.8 → 5.3 ms for the 1.13M-sample load, PERF.md round 3) — the
    values are bit-identical, only the indexing arithmetic moves into
    cheap VPU integer ops. flat_take keeps that single-dim form under
    vmap (batched serving) by linearizing the batch axis too."""
    from cubesat_apds_tpu.ops.features.flat_gather import flat_take

    L, H, W = packed_stack.shape[:3]
    flat = packed_stack.reshape(L * H * W, packed_stack.shape[3])

    def sample(iy, ix):
        hs = level_hw[lvl, 0][:, None]
        ws = level_hw[lvl, 1][:, None]
        ix_c = jnp.clip(ix, 0, ws - 1)
        iy_c = jnp.clip(iy, 0, hs - 1)
        lin = (lvl[:, None] * H + iy_c) * W + ix_c
        return flat_take(flat, lin).astype(jnp.float32)

    return sample


def compute_orientations(packed_stack, level_hw, xy, size, class_id,
                         octave, valid, sample_fn=None, mode="exact"):
    """Dominant orientation per keypoint.

    packed_stack: [L, H, W, C≥3] per-level stack with channels
    (Lt, Lx, Ly, ...). level_hw: [L, 2] int32 actual (h, w) per level.
    xy [K, 2] original-image coords; size [K]; class_id [K] level index;
    octave [K]. sample_fn overrides the sampling backend (one-hot patch
    sampler from akaze.py; defaults to direct gather). mode="fast" uses
    the 55-point checkerboard disc subset.
    Returns angle [K] in [0, 2π).
    """
    lvl = jnp.clip(class_id, 0, packed_stack.shape[0] - 1)
    iy, ix = orientation_sample_coords(xy, size, class_id, octave, mode)
    if sample_fn is None:
        sample_fn = gather_sampler(packed_stack, level_hw, lvl)
    vals = sample_fn(iy, ix)                                  # [K, S, C]
    weights = _GAUSS_W_FAST if mode == "fast" else _GAUSS_W
    res_x = vals[..., 1] * jnp.asarray(weights)[None, :]
    res_y = vals[..., 2] * jnp.asarray(weights)[None, :]

    ang = jnp.arctan2(res_y, res_x)
    ang = jnp.where(ang < 0, ang + 2.0 * jnp.pi, ang)          # [K, 109]

    starts = jnp.asarray(_WINDOW_STARTS)                       # [42]
    rel = ang[:, None, :] - starts[None, :, None]               # [K, 42, 109]
    rel = jnp.where(rel < 0, rel + 2.0 * jnp.pi, rel)
    in_win = rel < (jnp.pi / 3.0)

    sum_x = jnp.sum(jnp.where(in_win, res_x[:, None, :], 0.0), axis=-1)
    sum_y = jnp.sum(jnp.where(in_win, res_y[:, None, :], 0.0), axis=-1)
    mag = sum_x * sum_x + sum_y * sum_y                         # [K, 42]
    best = jnp.argmax(mag, axis=-1)
    k_idx = jnp.arange(ang.shape[0])
    bx = sum_x[k_idx, best]
    by = sum_y[k_idx, best]
    angle = jnp.arctan2(by, bx)
    angle = jnp.where(angle < 0, angle + 2.0 * jnp.pi, angle)
    return jnp.where(valid, angle, 0.0)
