"""Full MLDB binary descriptor (486 bits / 61 bytes), batched.

Descriptor half of the reference's AKAZE call (feature_extraction/src/
lib.rs:64-73: DESCRIPTOR_MLDB, descriptor_size=0 ⇒ full, 3 channels).

MLDB (Modified-Local Difference Binary) structure:
  * a (2·pattern_size)² patch around the keypoint, rotated by its angle,
    sampled with step = keypoint scale, nearest-neighbour;
  * three grids over the patch — 2×2, 3×3, 4×4 cells — each cell holding
    the MEAN of (intensity, rotated ∂x, rotated ∂y) over its samples;
  * for each grid: all cell pairs (i<j) compared per channel →
    (6 + 36 + 120) pairs × 3 channels = 486 bits, LSB-first packed.

TPU shape: the sample→cell assignment is STATIC (it depends only on
pattern geometry), so cell means for all keypoints are one einsum
[K, 441, 3] × [cells, 441] on the MXU, and the comparisons are a static
gather of pair indices — no per-keypoint control flow anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.core.config import AkazeConfig, DESC_BYTES
from cubesat_apds_tpu.ops.match import pack_bits

_PATTERN = 10  # descriptor_pattern_size default


def _grid_geometry(pattern: int = _PATTERN):
    """Static (offsets [S,2], per-grid averaging matrices, pair indices).

    Offsets enumerate every integer (k, l) the three grids touch. Grid
    level g has cells indexed row-major over i (outer) then j (inner) to
    match the original's loop order.
    """
    size_mult = [1.0, 2.0 / 3.0, 1.0 / 2.0]
    # All integer sample offsets used by any grid: k ∈ [-pattern, pattern].
    span = np.arange(-pattern, pattern + 1, dtype=np.int32)
    offsets = np.array([(k, l) for k in span for l in span], np.int32)  # [S,2]
    off_index = {(int(k), int(l)): n for n, (k, l) in enumerate(offsets)}

    avg_mats, pair_idx = [], []
    for g in range(3):
        step = int(np.ceil(pattern * size_mult[g]))
        cell_starts = list(range(-pattern, pattern, step))
        n_side = len(cell_starts)
        n_cells = n_side * n_side
        W = np.zeros((n_cells, offsets.shape[0]), np.float32)
        c = 0
        for i in cell_starts:
            for j in cell_starts:
                members = [(k, l) for k in range(i, i + step)
                           for l in range(j, j + step)]
                for k, l in members:
                    W[c, off_index[(k, l)]] = 1.0 / len(members)
                c += 1
        avg_mats.append(W)
        pairs = np.array([(i, j) for i in range(n_cells)
                          for j in range(i + 1, n_cells)], np.int32)
        pair_idx.append(pairs)
    return offsets, avg_mats, pair_idx


_OFFSETS, _AVG_MATS, _PAIR_IDX = _grid_geometry()


def _fround(x):
    return jnp.floor(x + 0.5).astype(jnp.int32)


def mldb_sample_coords(xy, size, angle, class_id, octave):
    """Rotated integer sample coordinates (iy, ix) [K, 441] of the MLDB
    pattern, in level coordinates (pre-clip)."""
    ratio = jnp.exp2(octave.astype(jnp.float32))
    s = _fround(0.5 * size / ratio).astype(jnp.float32)      # scale [K]
    xf = xy[:, 0] / ratio
    yf = xy[:, 1] / ratio
    co = jnp.cos(angle)
    si = jnp.sin(angle)
    offs = jnp.asarray(_OFFSETS, jnp.float32)                # [S, 2] (k, l)
    k_off = offs[:, 0][None, :]                              # [1, S]
    l_off = offs[:, 1][None, :]
    sample_x = xf[:, None] + s[:, None] * (k_off * co[:, None] - l_off * si[:, None])
    sample_y = yf[:, None] + s[:, None] * (k_off * si[:, None] + l_off * co[:, None])
    return _fround(sample_y), _fround(sample_x)


def mldb_descriptors(packed_stack, level_hw,
                     xy, size, angle, class_id, octave, valid,
                     sample_fn=None):
    """Packed MLDB descriptors [K, 61] uint8 for all keypoints at once.

    packed_stack: [L, H, W, C≥3] per-level stack, channels (Lt, Lx, Ly,
    ...) — Lt the diffused image, Lx/Ly the σ-scaled detection
    derivatives. sample_fn overrides the sampling backend (one-hot patch
    sampler; defaults to direct gather).
    """
    from cubesat_apds_tpu.ops.features.orientation import gather_sampler

    K = xy.shape[0]
    lvl = jnp.clip(class_id, 0, packed_stack.shape[0] - 1)
    co = jnp.cos(angle)
    si = jnp.sin(angle)
    iy, ix = mldb_sample_coords(xy, size, angle, class_id, octave)
    if sample_fn is None:
        sample_fn = gather_sampler(packed_stack, level_hw, lvl)
    vals = sample_fn(iy, ix)                                 # [K, S, C]
    di = vals[..., 0]
    rx = vals[..., 1]
    ry = vals[..., 2]
    # Rotate the gradient into the keypoint frame (linear — safe to do
    # before cell averaging).
    dx = rx * co[:, None] + ry * si[:, None]
    dy = -rx * si[:, None] + ry * co[:, None]
    samples = jnp.stack([di, dx, dy], axis=-1)               # [K, S, 3]

    bit_groups = []
    for g in range(3):
        Wg = jnp.asarray(_AVG_MATS[g])                       # [C, S]
        vals = jnp.einsum("cs,ksd->kcd", Wg, samples)        # [K, C, 3]
        pairs = jnp.asarray(_PAIR_IDX[g])                    # [P, 2]
        vi = vals[:, pairs[:, 0], :]                         # [K, P, 3]
        vj = vals[:, pairs[:, 1], :]
        bits = (vi > vj)                                     # [K, P, 3]
        # Channel-major order (channel outer, pairs inner), matching
        # MLDB_Binary_Comparisons.
        bit_groups.append(jnp.moveaxis(bits, -1, -2).reshape(K, -1))
    all_bits = jnp.concatenate(bit_groups, axis=-1)          # [K, 486]
    desc = pack_bits(all_bits)                               # [K, 61]
    return jnp.where(valid[:, None], desc, jnp.uint8(0))


def descriptor_bytes() -> int:
    return DESC_BYTES


# --- Fast mode: one blur-matched sample per cell ---------------------------

def _cell_centers(pattern: int = _PATTERN):
    """Static per-grid-level cell centers in pattern coordinates."""
    size_mult = [1.0, 2.0 / 3.0, 1.0 / 2.0]
    out = []
    for g in range(3):
        step = int(np.ceil(pattern * size_mult[g]))
        starts = list(range(-pattern, pattern, step))
        centers = np.array([(i + (step - 1) / 2.0, j + (step - 1) / 2.0)
                            for i in starts for j in starts], np.float32)
        out.append((step, centers))
    return out


_CELL_CENTERS = _cell_centers()


def fast_blur_sigmas(scale: int):
    """Per-grid-level Gaussian σ (level pixels) matching a box mean over
    a (step·scale)² cell: σ = step·scale/√12."""
    return [step * scale / np.sqrt(12.0) for step, _ in _CELL_CENTERS]


def _subcell_geometry(sub: int, pattern: int = _PATTERN):
    """Static per-grid sub×sub subcell centers + weights.

    Each cell's integer samples {i..i+step−1} split into `sub` discrete
    parts along each axis (bounds round(step·k/sub)); a subcell's center
    is the mean position of its part's samples and its weight the count
    fraction, so the weighted subcell average reproduces the exact cell
    mean when each subcell sample equals its part-box mean. Returns per
    grid (step, centers [n_cells·m², 2], weights [n_cells·m²], m) with
    m = number of non-empty parts (≤ sub for small steps)."""
    size_mult = [1.0, 2.0 / 3.0, 1.0 / 2.0]
    out = []
    for g in range(3):
        step = int(np.ceil(pattern * size_mult[g]))
        starts = list(range(-pattern, pattern, step))
        bounds = [round(step * k / sub) for k in range(sub + 1)]
        parts = []
        for k in range(sub):
            lo, hi = bounds[k], bounds[k + 1]
            if hi > lo:
                parts.append(((lo + hi - 1) / 2.0, (hi - lo) / step))
        centers, weights = [], []
        for i in starts:
            for j in starts:
                for ca, wa in parts:
                    for cb, wb in parts:
                        centers.append((i + ca, j + cb))
                        weights.append(wa * wb)
        out.append((step, np.asarray(centers, np.float32),
                    np.asarray(weights, np.float32), len(parts)))
    return out


_SUBCELL_CACHE: dict = {}


def _subcell(sub: int):
    if sub not in _SUBCELL_CACHE:
        _SUBCELL_CACHE[sub] = _subcell_geometry(sub)
    return _SUBCELL_CACHE[sub]


def approx_mldb_fn(config):
    """The approximate-mode descriptor function for a config — the ONE
    dispatch point for fast/hybrid (callers must not re-implement this
    switch). Returns f(combined_stack, level_hw, n_levels, xy, size,
    angle, class_id, octave, valid)."""
    import functools

    if config.descriptor_mode == "fast":
        return mldb_descriptors_fast
    return functools.partial(mldb_descriptors_hybrid,
                             sub=config.hybrid_subcells)


def approx_blur_sigmas_fn(config):
    """The blur-σ function paired with approx_mldb_fn (same dispatch)."""
    import functools

    if config.descriptor_mode == "fast":
        return fast_blur_sigmas
    return functools.partial(hybrid_blur_sigmas,
                             sub=config.hybrid_subcells)


def hybrid_blur_sigmas(scale: int, sub: int = 2):
    """Per-grid σ (level pixels) matching a box mean over a 1/sub cell
    part (step·scale/sub wide): σ = step·scale/(sub·√12)."""
    return [step * scale / (sub * np.sqrt(12.0))
            for step, _, _, _ in _subcell(sub)]


def mldb_descriptors_hybrid(combined_stack, level_hw, n_levels,
                            xy, size, angle, class_id, octave, valid,
                            sub: int = 2):
    """Approximate MLDB between `fast` and `exact`: each cell mean is a
    WEIGHTED average of sub×sub blur-matched subcell samples placed in
    the keypoint's rotated frame — 116 samples/keypoint at sub=2, 261 at
    sub=3 (vs 29 fast / 441 exact). Cuts the dominant fast-mode error
    (axis-aligned Gaussian vs rotated box mean) by the subdivision
    factor; bit layout and comparisons identical.

    combined_stack: [3·L, H, W, C] per-grid stacks blurred with
    hybrid_blur_sigmas(·, sub)."""
    K = xy.shape[0]
    lvl = jnp.clip(class_id, 0, n_levels - 1)
    ratio = jnp.exp2(octave.astype(jnp.float32))
    s = _fround(0.5 * size / ratio).astype(jnp.float32)
    xf = xy[:, 0] / ratio
    yf = xy[:, 1] / ratio
    co = jnp.cos(angle)
    si = jnp.sin(angle)

    hs = level_hw[lvl, 0][:, None]
    ws = level_hw[lvl, 1][:, None]
    lvl_col = lvl[:, None]

    geo = _subcell(sub)
    iy_parts, ix_parts, lvl_parts, w_parts, counts, msubs = \
        [], [], [], [], [], []
    for g in range(3):
        _, centers, weights, m = geo[g]
        msubs.append(m * m)
        k_off = jnp.asarray(centers[:, 0])[None, :]
        l_off = jnp.asarray(centers[:, 1])[None, :]
        sx = xf[:, None] + s[:, None] * (k_off * co[:, None] - l_off * si[:, None])
        sy = yf[:, None] + s[:, None] * (k_off * si[:, None] + l_off * co[:, None])
        ix_parts.append(jnp.clip(_fround(sx), 0, ws - 1))
        iy_parts.append(jnp.clip(_fround(sy), 0, hs - 1))
        lvl_parts.append(jnp.broadcast_to(lvl_col + g * n_levels,
                                          (K, centers.shape[0])))
        w_parts.append(jnp.asarray(weights))
        counts.append(centers.shape[0])
    iy_all = jnp.concatenate(iy_parts, axis=1)            # [K, 116]
    ix_all = jnp.concatenate(ix_parts, axis=1)
    lvl_all = jnp.concatenate(lvl_parts, axis=1)
    from cubesat_apds_tpu.ops.features.flat_gather import flat_take

    L3, Hs_, Ws_ = combined_stack.shape[:3]
    flat = combined_stack.reshape(L3 * Hs_ * Ws_, combined_stack.shape[3])
    lin = (lvl_all * Hs_ + iy_all) * Ws_ + ix_all
    vals = flat_take(flat, lin).astype(jnp.float32)
    di = vals[..., 0]
    rx = vals[..., 1]
    ry = vals[..., 2]
    dx = rx * co[:, None] + ry * si[:, None]
    dy = -rx * si[:, None] + ry * co[:, None]
    samp_all = jnp.stack([di, dx, dy], axis=-1)           # [K, 116, 3]

    bit_groups = []
    off = 0
    for g in range(3):
        n_sub = counts[g]
        ms = msubs[g]
        block = samp_all[:, off:off + n_sub]              # [K, m²·C, 3]
        w = w_parts[g][None, :, None]
        cell_vals = (block * w).reshape(K, n_sub // ms, ms, 3).sum(axis=2)
        off += n_sub
        pairs = jnp.asarray(_PAIR_IDX[g])
        vi = cell_vals[:, pairs[:, 0], :]
        vj = cell_vals[:, pairs[:, 1], :]
        bits = vi > vj
        bit_groups.append(jnp.moveaxis(bits, -1, -2).reshape(K, -1))
    all_bits = jnp.concatenate(bit_groups, axis=-1)
    desc = pack_bits(all_bits)
    return jnp.where(valid[:, None], desc, jnp.uint8(0))


def mldb_descriptors_fast(combined_stack, level_hw, n_levels,
                          xy, size, angle, class_id, octave, valid):
    """Approximate MLDB: cell means = one sample per cell from a
    blur-matched pyramid.

    combined_stack: [3·L, H, W, C] — the three per-grid blur-matched
    stacks (grid g blurred with σ = step_g·s_level/√12 per level)
    concatenated along the level axis, so ALL 29 samples/keypoint come
    from ONE gather (TPU gathers are per-index latency-bound, see
    PERF.md — merging the three per-grid gathers saves two dispatches).
    29 samples/keypoint instead of 441 (the exact mode); bit layout and
    comparisons identical.
    """
    K = xy.shape[0]
    lvl = jnp.clip(class_id, 0, n_levels - 1)
    ratio = jnp.exp2(octave.astype(jnp.float32))
    s = _fround(0.5 * size / ratio).astype(jnp.float32)
    xf = xy[:, 0] / ratio
    yf = xy[:, 1] / ratio
    co = jnp.cos(angle)
    si = jnp.sin(angle)

    hs = level_hw[lvl, 0][:, None]
    ws = level_hw[lvl, 1][:, None]
    lvl_col = lvl[:, None]

    iy_parts, ix_parts, lvl_parts, counts = [], [], [], []
    for g in range(3):
        _, centers = _CELL_CENTERS[g]
        k_off = jnp.asarray(centers[:, 0])[None, :]
        l_off = jnp.asarray(centers[:, 1])[None, :]
        sx = xf[:, None] + s[:, None] * (k_off * co[:, None] - l_off * si[:, None])
        sy = yf[:, None] + s[:, None] * (k_off * si[:, None] + l_off * co[:, None])
        ix = jnp.clip(_fround(sx), 0, ws - 1)
        iy = jnp.clip(_fround(sy), 0, hs - 1)
        ix_parts.append(ix)
        iy_parts.append(iy)
        lvl_parts.append(jnp.broadcast_to(lvl_col + g * n_levels, ix.shape))
        counts.append(centers.shape[0])
    iy_all = jnp.concatenate(iy_parts, axis=1)            # [K, 29]
    ix_all = jnp.concatenate(ix_parts, axis=1)
    lvl_all = jnp.concatenate(lvl_parts, axis=1)
    # Flat linearized gather — see gather_sampler (2.6× over 3-index);
    # flat_take keeps the single-dim form under vmap (batched serving).
    from cubesat_apds_tpu.ops.features.flat_gather import flat_take

    L3, Hs_, Ws_ = combined_stack.shape[:3]
    flat = combined_stack.reshape(L3 * Hs_ * Ws_, combined_stack.shape[3])
    lin = (lvl_all * Hs_ + iy_all) * Ws_ + ix_all
    vals = flat_take(flat, lin).astype(jnp.float32)
    di = vals[..., 0]
    rx = vals[..., 1]
    ry = vals[..., 2]
    dx = rx * co[:, None] + ry * si[:, None]
    dy = -rx * si[:, None] + ry * co[:, None]
    cell_all = jnp.stack([di, dx, dy], axis=-1)           # [K, 29, 3]

    bit_groups = []
    off = 0
    for g in range(3):
        cell_vals = cell_all[:, off:off + counts[g]]
        off += counts[g]
        pairs = jnp.asarray(_PAIR_IDX[g])
        vi = cell_vals[:, pairs[:, 0], :]
        vj = cell_vals[:, pairs[:, 1], :]
        bits = vi > vj
        bit_groups.append(jnp.moveaxis(bits, -1, -2).reshape(K, -1))
    all_bits = jnp.concatenate(bit_groups, axis=-1)
    desc = pack_bits(all_bits)
    return jnp.where(valid[:, None], desc, jnp.uint8(0))
