"""Checkerboard inner-corner detection, jittable.

Replaces OpenCV findChessboardCorners (CALIB_CB_ADAPTIVE_THRESH) as used
by the calibrator (reference: calibrator/src/main.rs:44-55). TPU-native
approach (no region-growing/quad fitting):

  1. saddle-point response: checkerboard inner corners are intensity
     saddles — score with −det(Hessian) of the blurred image (strongly
     positive at saddles), plus a local-contrast gate;
  2. NMS + fixed-capacity top-k candidates;
  3. grid ordering: RANSAC-free — pick the 4 outermost candidates (max
     spread along the board diagonals), fit a homography from the unit
     grid's corners, snap every expected grid node to its nearest
     candidate, and iterate the fit with all snapped nodes (3 rounds);
  4. sub-pixel refinement by quadratic fit on the saddle response.

Output order is row-major like OpenCV's, matching the planar_grid object
points (calibration.planar_grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.ops.geometry.homography import dlt_homography
from cubesat_apds_tpu.ops.resample import gaussian_blur, separable_conv2d
from cubesat_apds_tpu.ops.warp import apply_homography

_D1 = jnp.array([-0.5, 0.0, 0.5])
_SMOOTH = jnp.array([0.25, 0.5, 0.25])
_IDENT = jnp.array([0.0, 1.0, 0.0])


def saddle_response(img, sigma: float = 2.0):
    """−det(Hessian): positive at saddle points (checkerboard corners)."""
    L = gaussian_blur(jnp.asarray(img, jnp.float32), sigma)
    lx = separable_conv2d(L, _SMOOTH, _D1)
    ly = separable_conv2d(L, _D1, _SMOOTH)
    lxx = separable_conv2d(lx, _IDENT, _D1)
    lyy = separable_conv2d(ly, _D1, _IDENT)
    lxy = separable_conv2d(lx, _D1, _IDENT)
    return -(lxx * lyy - lxy * lxy)


def _nms_candidates(resp, capacity: int, border: int = 4):
    h, w = resp.shape
    neg = jnp.finfo(resp.dtype).min
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # Saddle responses PLATEAU across the 2×2 pixels around a corner (it
    # sits between pixels): break exact ties with a tiny deterministic
    # positional bias so NMS keeps exactly one peak per plateau on every
    # platform (TPU and CPU order ties differently otherwise).
    tiny = 1e-6 * jnp.maximum(jnp.max(jnp.abs(resp)), 1e-20)
    key = resp - tiny * ((ys * w + xs).astype(resp.dtype) / (h * w))
    rp = jnp.pad(key, ((2, 2), (2, 2)), constant_values=neg)
    pooled = jax.lax.reduce_window(rp, neg, jax.lax.max, (5, 5), (1, 1),
                                   "VALID")
    inside = (xs >= border) & (xs < w - border) & \
             (ys >= border) & (ys < h - border)
    peak = (key >= pooled) & (resp > 0) & inside
    vals = jnp.where(peak, resp, neg)
    v, idx = jax.lax.top_k(vals.reshape(-1), capacity)
    py = (idx // w).astype(jnp.float32)
    px = (idx % w).astype(jnp.float32)
    valid = v > 0
    return jnp.stack([px, py], -1), v, valid


@functools.partial(jax.jit, static_argnames=("nx", "ny", "capacity"))
def find_chessboard_corners(img, nx: int, ny: int, capacity: int = 256):
    """Detect the (nx × ny) inner-corner grid.

    Returns (corners [nx*ny, 2] float32 row-major, found bool). Like the
    OpenCV call, `found` is False when the grid cannot be recovered.
    """
    img = jnp.asarray(img, jnp.float32)
    n_corners = nx * ny
    resp = saddle_response(img)
    # Gate by local-mean balance: a true inner corner averages two black
    # and two white quadrants (local mean ≈ mid-gray); board-boundary
    # corners abut the background on 2–3 quadrants (mean far from mid).
    # A multiplicative gate breaks response ties ROBUSTLY — synthetic
    # boards give bit-identical saddle responses and top-k tie order is
    # platform-dependent.
    local_mean = gaussian_blur(img, 3.0)
    lo = jnp.min(img)
    hi = jnp.max(img)
    mid = 0.5 * (lo + hi)
    half_range = jnp.maximum(0.5 * (hi - lo), 1e-6)
    balance = 1.0 - jnp.clip(jnp.abs(local_mean - mid) / half_range, 0.0, 1.0)
    resp = resp * balance
    cand_xy, cand_v, cand_valid = _nms_candidates(resp, capacity)
    # HARD gate on the balance at each candidate (inner corners ≈ 1.0,
    # board-boundary corners ≤ ~0.5): order-independent — selection by
    # response RANK is fragile because synthetic boards produce exact
    # response ties whose top-k order differs between platforms and even
    # jit/eager.
    ci = jnp.clip(cand_xy.astype(jnp.int32), 0,
                  jnp.asarray([img.shape[1] - 1, img.shape[0] - 1]))
    cand_balance = balance[ci[:, 1], ci[:, 0]]
    # 0.75 separates inner corners (~0.98) from the board's outer
    # corner points (~0.64) and edge midpoints (~0.49).
    cand_valid = cand_valid & (cand_balance > 0.75)
    # Relative response gate: true corners respond within ~1 order of
    # magnitude of each other; interpolation/noise saddles are ~100×
    # weaker (measured bimodal split ≈ 0.004·max).
    v_max = jnp.max(jnp.where(cand_valid, cand_v, 0.0))
    cand_valid = cand_valid & (cand_v > 0.1 * v_max)

    # --- Initial 4-corner estimate: extremes along the two diagonals. ---
    # Restricted to STRONG candidates: board-boundary pseudo-saddles
    # (where dark squares abut a background of the light-square shade —
    # locally indistinguishable in balance) survive the loose gate but
    # respond ≤ ~0.19·max on perspective-warped boards, vs ≥ 0.75·max
    # for true inner corners (measured across warped synthetic boards).
    # They sit OUTSIDE the grid, so an extreme pick that includes them
    # wrecks the homography init; the snap below still uses the loose
    # set (dim-but-true corners remain snappable).
    strong = cand_valid & (cand_v > 0.3 * v_max)
    big = jnp.float32(1e9)
    score_tl = jnp.where(strong, cand_xy[:, 0] + cand_xy[:, 1], big)
    score_br = jnp.where(strong, cand_xy[:, 0] + cand_xy[:, 1], -big)
    score_tr = jnp.where(strong, cand_xy[:, 0] - cand_xy[:, 1], -big)
    score_bl = jnp.where(strong, cand_xy[:, 0] - cand_xy[:, 1], big)
    p_tl = cand_xy[jnp.argmin(score_tl)]
    p_br = cand_xy[jnp.argmax(score_br)]
    p_tr = cand_xy[jnp.argmax(score_tr)]
    p_bl = cand_xy[jnp.argmin(score_bl)]

    unit_corners = jnp.array(
        [[0.0, 0.0], [nx - 1.0, 0.0], [0.0, ny - 1.0], [nx - 1.0, ny - 1.0]],
        jnp.float32)
    img_corners = jnp.stack([p_tl, p_tr, p_bl, p_br])

    gy, gx = jnp.mgrid[0:ny, 0:nx]
    grid = jnp.stack([gx, gy], -1).reshape(-1, 2).astype(jnp.float32)

    H = dlt_homography(unit_corners, img_corners)

    def refine_round(H, _):
        pred = apply_homography(H, grid)                    # [n_corners, 2]
        d2 = jnp.sum(
            (pred[:, None, :] - cand_xy[None, :, :]) ** 2, -1)
        d2 = jnp.where(cand_valid[None, :], d2, big)
        nearest = jnp.argmin(d2, axis=1)
        snapped = cand_xy[nearest]
        H_new = dlt_homography(grid, snapped)
        ok = jnp.all(jnp.isfinite(H_new))
        return jnp.where(ok, H_new, H), (snapped, jnp.min(d2, axis=1))

    H, (snapped, dmin) = jax.lax.scan(refine_round, H, None, length=3)
    snapped = snapped[-1]
    dmin = dmin[-1]

    # --- Validation: every node snapped uniquely and close. ---
    # Cell pitch estimate from the homography scale.
    pitch2 = jnp.sum((apply_homography(H, jnp.array([[0.0, 0.0]]))[0]
                      - apply_homography(H, jnp.array([[1.0, 0.0]]))[0]) ** 2)
    close = dmin < 0.25 * pitch2
    # Uniqueness: every grid node must snap to a DISTINCT candidate —
    # a shifted lattice aliases several nodes onto one corner.
    pred = apply_homography(H, grid)
    d2 = jnp.sum((pred[:, None, :] - cand_xy[None, :, :]) ** 2, -1)
    d2 = jnp.where(cand_valid[None, :], d2, big)
    nearest = jnp.argmin(d2, axis=1)
    counts = jnp.zeros((capacity,), jnp.int32).at[nearest].add(1)
    unique = jnp.max(counts) <= 1
    found = jnp.all(close) & unique & (jnp.sum(cand_valid) >= n_corners)

    # --- Sub-pixel refinement on the saddle response. ---
    h, w = resp.shape
    px = jnp.clip(snapped[:, 0].astype(jnp.int32), 1, w - 2)
    py = jnp.clip(snapped[:, 1].astype(jnp.int32), 1, h - 2)

    def grab(dy, dx):
        return resp[py + dy, px + dx]

    v_c = grab(0, 0)
    dx1 = 0.5 * (grab(0, 1) - grab(0, -1))
    dy1 = 0.5 * (grab(1, 0) - grab(-1, 0))
    dxx = grab(0, 1) + grab(0, -1) - 2 * v_c
    dyy = grab(1, 0) + grab(-1, 0) - 2 * v_c
    dxy = 0.25 * (grab(1, 1) + grab(-1, -1) - grab(1, -1) - grab(-1, 1))
    det = dxx * dyy - dxy * dxy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ox = jnp.clip(-(dyy * dx1 - dxy * dy1) / det, -1.0, 1.0)
    oy = jnp.clip(-(dxx * dy1 - dxy * dx1) / det, -1.0, 1.0)
    corners = snapped + jnp.stack([ox, oy], -1)
    return corners, found
