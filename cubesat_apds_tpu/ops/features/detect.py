"""AKAZE keypoint detection: scale-normalized det-Hessian + NMS + top-K.

Detector half of the reference's AKAZE call
(feature_extraction/src/lib.rs:61-92). TPU-native shape decisions:

  * Multiscale Scharr-family derivatives at integer scale s are separable
    3-tap convolutions with taps at {−s, 0, +s} — static kernels per level.
  * The sequential "is_repeated" candidate dedup of the original becomes a
    parallel 3-D NMS: a candidate survives if it is the strict spatial
    3×3 max of its level, above threshold, and not dominated by a larger
    response within its size radius at the adjacent levels (computed with
    max-pool + nearest-resampling — all convolution-shaped ops).
  * Data-dependent keypoint counts become a fixed-capacity top-K by
    response with a validity mask (SURVEY.md §7 hard part #3); capacity
    semantics mirror the reference cap of 2^18−1 (lib.rs:12-13).
  * Sub-pixel refinement is the standard 2×2 quadratic fit; candidates
    whose offset exceeds 1 pixel are dropped (same acceptance rule).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.core.types import Keypoints
from cubesat_apds_tpu.ops.features.flat_gather import flat_take
from cubesat_apds_tpu.ops.features.scale_space import LevelMeta, ScaleSpace
from cubesat_apds_tpu.ops.resample import separable_conv2d


def _deriv_kernels(scale: int):
    """Scaled Scharr-family kernels: smoothing + central difference with
    taps at {−scale, 0, +scale} (compute_derivative_kernels semantics)."""
    ksize = 3 + 2 * (scale - 1)
    w = 10.0 / 3.0
    norm = 1.0 / (2.0 * scale * (w + 2.0))
    smooth = np.zeros(ksize, np.float32)
    smooth[0] = norm
    smooth[ksize // 2] = w * norm
    smooth[-1] = norm
    deriv = np.zeros(ksize, np.float32)
    deriv[0] = -1.0
    deriv[-1] = 1.0
    return smooth, deriv


def scharr_scale(img, scale: int, dx: int, dy: int):
    """Scaled Scharr derivative (order 1 in one axis, smoothing in the other)."""
    smooth, deriv = _deriv_kernels(scale)
    row = deriv if dy else smooth   # kernel applied along H
    col = deriv if dx else smooth   # kernel applied along W
    return separable_conv2d(img, row, col, pad_mode="reflect")


def det_hessian_response(Lsmooth, sigma_size: int):
    """σ⁴-normalized determinant of Hessian of one level.

    First derivatives at scale s scaled by s, second derivatives (derivative
    of the derivative, same scale) scaled by s² — then det = Lxx·Lyy − Lxy².
    Also returns (Lx, Ly) scaled by s for orientation/descriptor use.
    """
    s = sigma_size
    lx = scharr_scale(Lsmooth, s, 1, 0)
    ly = scharr_scale(Lsmooth, s, 0, 1)
    lxx = scharr_scale(lx, s, 1, 0) * (s * s)
    lyy = scharr_scale(ly, s, 0, 1) * (s * s)
    lxy = scharr_scale(lx, s, 0, 1) * (s * s)
    ldet = lxx * lyy - lxy * lxy
    return ldet, lx * s, ly * s


def _shift2d(x, dy: int, dx: int):
    """Edge-clamped static shift of [H, W] (view-based, fuses)."""
    h, w = x.shape
    xp = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    return xp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def _maxpool_1d(x, r: int, axis: int):
    neg = jnp.finfo(x.dtype).min
    n = x.shape[axis]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (r, r)
    xp = jnp.pad(x, pads, constant_values=neg)
    out = None
    for k in range(2 * r + 1):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        t = xp[tuple(sl)]
        out = t if out is None else jnp.maximum(out, t)
    return out


def _maxpool3x3(x):
    """3×3 max-pool, same shape (separable shift-max: fuses on the VPU,
    avoiding reduce_window's windowed lowering)."""
    return _maxpool_1d(_maxpool_1d(x, 1, x.ndim - 2), 1, x.ndim - 1)


def _maxpool_radius(x, r: int):
    """(2r+1)² max-pool, same shape, separable."""
    if r <= 0:
        return x
    return _maxpool_1d(_maxpool_1d(x, r, x.ndim - 2), r, x.ndim - 1)


def _resample_to(x, shape_hw):
    """Nearest-resample a response map to another level's grid (for
    cross-octave comparisons). Shapes are static; factor is 2 or 1/2."""
    h, w = x.shape
    th, tw = shape_hw
    if (h, w) == (th, tw):
        return x
    if th <= h:  # downsample by 2: max of 2×2 (conservative for suppression)
        x = x[: th * 2, : tw * 2]
        x = x.reshape(th, 2, tw, 2)
        return x.max(axis=(1, 3))
    # Upsample by 2: repeat, then edge-pad any odd-dimension shortfall
    # (a 25-px level half-samples to 12, and 12×2 = 24 ≠ 25 — hit by
    # non-power-of-two rectangular preprocessor tiles).
    x = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    x = x[:th, :tw]
    if x.shape != (th, tw):
        x = jnp.pad(x, ((0, th - x.shape[0]), (0, tw - x.shape[1])),
                    mode="edge")
    return x


def detect_keypoints(ss: ScaleSpace, config: AkazeConfig = AkazeConfig(),
                     capacity: int | None = None
                     ) -> Tuple[Keypoints, List[jax.Array], List[jax.Array]]:
    """Scale-space extrema → fixed-capacity Keypoints (+ per-level Lx, Ly).

    Returns (keypoints, Lx_list, Ly_list); keypoint class_id = evolution
    level index (as in the original, it addresses the level's images for
    orientation + descriptor sampling).
    """
    capacity = capacity or config.capacity
    meta = ss.meta
    n_levels = len(meta)

    ldet_list, lx_list, ly_list = [], [], []
    for i in range(n_levels):
        ldet, lx, ly = det_hessian_response(ss.Lsmooth[i], meta[i].sigma_size)
        ldet_list.append(ldet)
        lx_list.append(lx)
        ly_list.append(ly)

    # --- NMS per level + cross-level suppression (all DENSE maps). ---
    # Every acceptance rule — strict spatial peak, threshold, border,
    # cross-level dominance, sub-pixel refine acceptance — is a per-pixel
    # predicate, so it is applied to the dense response map BEFORE any
    # candidate extraction. That leaves ONE global top-K over the
    # concatenated maps instead of 16 per-level top-k calls + an exact
    # merge (measured: the per-level extraction dominated the detect
    # stage; a candidate in the global top-K is by construction in its
    # level's top-K, so the selected set is unchanged).
    masked_maps, sub_maps = [], []
    thr = jnp.float32(config.threshold)
    for i in range(n_levels):
        ldet = ldet_list[i]
        h, w = ldet.shape
        m = meta[i]
        is_peak = ldet >= _maxpool3x3(ldet)
        above = ldet > thr
        # Suppression radius in this level's pixels ≈ the point's size
        # footprint (esigma·derivative_factor / ratio).
        r = max(int(round(m.esigma * config.derivative_factor / m.ratio)), 1)
        dominated = jnp.zeros_like(ldet, dtype=bool)
        for j in (i - 1, i + 1):
            if j < 0 or j >= n_levels:
                continue
            other = _resample_to(ldet_list[j], (h, w))
            other_max = _maxpool_radius(other, r)
            if j < i:
                # Strictly-greater earlier level wins ties (the sequential
                # original keeps the earlier point on equal response).
                dominated = dominated | (other_max >= ldet)
            else:
                dominated = dominated | (other_max > ldet)
        # Border exclusion.
        ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        b = m.border
        inside = (xs >= b) & (xs < w - b) & (ys >= b) & (ys < h - b)

        # Sub-pixel refinement: quadratic fit computed DENSELY as shifted
        # whole-map expressions (fused VPU work); the per-candidate read
        # is one packed 4-wide row gather after the global top-K —
        # point-gathering 3×3 windows is ~10× slower on TPU.
        def sh(dy, dx):
            return _shift2d(ldet, dy, dx)

        dx1 = 0.5 * (sh(0, 1) - sh(0, -1))
        dy1 = 0.5 * (sh(1, 0) - sh(-1, 0))
        dxx = sh(0, 1) + sh(0, -1) - 2.0 * ldet
        dyy = sh(1, 0) + sh(-1, 0) - 2.0 * ldet
        dxy = 0.25 * (sh(1, 1) + sh(-1, -1) - sh(1, -1) - sh(-1, 1))
        det = dxx * dyy - dxy * dxy
        det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        offx_map = -(dyy * dx1 - dxy * dy1) / det_safe
        offy_map = -(dxx * dy1 - dxy * dx1) / det_safe
        refine_ok = (jnp.abs(offx_map) <= 1.0) & (jnp.abs(offy_map) <= 1.0)

        keep = (is_peak & above & inside & ~dominated & refine_ok
                & (ldet > 0))
        masked_maps.append(jnp.where(keep, ldet, -jnp.inf).reshape(-1))
        # Channel 2 carries the level index so the winner gather needs
        # no searchsorted over level boundaries (≤16 is exact in f32).
        sub_maps.append(jnp.stack(
            [offx_map, offy_map, jnp.full_like(offx_map, float(i)),
             jnp.zeros_like(offx_map)], axis=-1).reshape(-1, 4))

    # --- ONE global top-K over all levels' masked maps. ---
    all_vals = jnp.concatenate(masked_maps)          # [P]
    all_sub = jnp.concatenate(sub_maps)              # [P, 4]
    p_total = all_vals.shape[0]
    k = min(capacity, p_total)
    if p_total > 4 * k and config.detect_topk == "approx":
        # TPU-native partial-reduce top-k (~4× cheaper than the
        # sort-based lax.top_k); post-NMS maps are sparse, so recall
        # loss only affects ties among the weakest candidates.
        top_vals, top_idx = jax.lax.approx_max_k(
            all_vals, k, recall_target=0.95)
    else:
        top_vals, top_idx = jax.lax.top_k(all_vals, k)

    sel = flat_take(all_sub, top_idx)                # [k, 4]
    # Canonical tie order: top-k breaks equal-response ties differently
    # between the vmapped and single-frame lowerings (measured:
    # mirror-symmetric scenes come out pair-swapped), so the rank output
    # cannot break ties. The candidate's MAP position (global flat
    # index) is its canonical identity; re-sort the selected k by
    # (response DESC, map position ASC) — an O(k log k) sort over
    # ≤capacity rows — so batched serving is bit-identical to
    # single-frame calls whenever the selected SET agrees (ties
    # straddling the capacity cutoff remain ambiguous).
    perm = jnp.lexsort((top_idx, -top_vals))
    top_vals = top_vals[perm]
    top_idx = top_idx[perm]
    sel = sel[perm]
    sel_lvl = jnp.clip(sel[:, 2].astype(jnp.int32), 0, n_levels - 1)

    # Static per-level tables: flat offset, width, display ratio.
    offs_np = np.zeros(n_levels, np.int64)
    for i in range(1, n_levels):
        offs_np[i] = offs_np[i - 1] + (ldet_list[i - 1].shape[0]
                                       * ldet_list[i - 1].shape[1])
    level_off = jnp.asarray(offs_np.astype(np.int32))
    level_w = jnp.asarray([ld.shape[1] for ld in ldet_list], jnp.int32)
    ratios = jnp.asarray([m.ratio for m in meta], jnp.float32)

    local = top_idx - level_off[sel_lvl]
    py = local // level_w[sel_lvl]
    px = local % level_w[sel_lvl]
    ratio = ratios[sel_lvl]
    sel_x = (px.astype(jnp.float32) + sel[:, 0]) * ratio
    sel_y = (py.astype(jnp.float32) + sel[:, 1]) * ratio
    valid = jnp.isfinite(top_vals)

    esigmas = jnp.asarray([m.esigma for m in meta], jnp.float32)
    octaves = jnp.asarray([m.octave for m in meta], jnp.int32)
    size = esigmas[sel_lvl] * config.derivative_factor

    if k < capacity:
        pad = capacity - k
        top_vals = jnp.pad(top_vals, (0, pad))
        sel_x = jnp.pad(sel_x, (0, pad))
        sel_y = jnp.pad(sel_y, (0, pad))
        sel_lvl = jnp.pad(sel_lvl, (0, pad))
        size = jnp.pad(size, (0, pad))
        valid = jnp.pad(valid, (0, pad))

    # Mask invalid slots at the source: their gathered values are
    # whatever -inf tie the (possibly approximate) top-k happened to
    # keep, and that garbage is NOT stable across lowerings (vmapped vs
    # single compilations pick different ties). Downstream ops mask by
    # `valid` anyway; zeroing here makes outputs bit-deterministic.
    kps = Keypoints(
        xy=jnp.where(valid[:, None], jnp.stack([sel_x, sel_y], axis=-1),
                     0.0),
        size=jnp.where(valid, size, 0.0),
        angle=jnp.zeros((capacity,), jnp.float32),
        response=jnp.where(valid, top_vals, 0.0),
        octave=jnp.where(valid, octaves[jnp.clip(sel_lvl, 0, n_levels - 1)], 0),
        class_id=jnp.where(valid, sel_lvl, -1),
        valid=valid,
    )
    return kps, lx_list, ly_list
