"""Camera calibration: Zhang's method + Levenberg–Marquardt refinement.

TPU-native replacement for OpenCV calibrateCamera as used by the
calibrator binary (reference: calibrator/src/main.rs:65-80 — planar
checkerboard views → K matrix, distortion, RMS reprojection error).

Pipeline (all jittable, fixed number of views):
  1. per-view homography from the z=0 object grid (our DLT),
  2. closed-form intrinsics from the B = K⁻ᵀK⁻¹ constraints (Zhang),
  3. per-view extrinsics from H and K,
  4. joint LM over {fx, fy, cx, cy, skew, k1, k2, p1, p2, k3, per-view
     rvec/tvec} minimizing pixel reprojection, fixed iteration count.

Unlike the reference, views whose corner detection failed can be masked
out via `view_valid` (the reference passes them through unfiltered —
calibrator/src/main.rs:42-55, flagged in SURVEY.md as a quirk to fix).
"""

from __future__ import annotations

from cubesat_apds_tpu.ops.geometry.linalg_small import (
    highest_matmul_precision as _highest_matmul_precision)

import dataclasses
import functools

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.core.config import CalibConfig
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.core.camera import distort_normalized
from cubesat_apds_tpu.ops.geometry.homography import dlt_homography
from cubesat_apds_tpu.ops.geometry.rodrigues import (
    matrix_to_rodrigues,
    rodrigues_to_matrix,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CalibrationResult:
    camera: CameraModel
    rvecs: jax.Array        # [V, 3]
    tvecs: jax.Array        # [V, 3]
    rms: jax.Array          # scalar — RMS reprojection error in pixels
    ok: jax.Array


def _vij(H, i, j):
    """Zhang's v_ij constraint vector from homography columns."""
    h = H
    return jnp.stack([
        h[0, i] * h[0, j],
        h[0, i] * h[1, j] + h[1, i] * h[0, j],
        h[1, i] * h[1, j],
        h[2, i] * h[0, j] + h[0, i] * h[2, j],
        h[2, i] * h[1, j] + h[1, i] * h[2, j],
        h[2, i] * h[2, j],
    ])


def _intrinsics_from_homographies(Hs, view_valid):
    """Closed-form K from ≥3 view homographies (Zhang §3.1)."""
    def rows(H):
        return jnp.stack([_vij(H, 0, 1), _vij(H, 0, 0) - _vij(H, 1, 1)])

    V = jax.vmap(rows)(Hs)                       # [Views, 2, 6]
    w = view_valid.astype(V.dtype)[:, None, None]
    V = (V * w).reshape(-1, 6)
    VtV = V.T @ V
    _, vecs = jnp.linalg.eigh(VtV)
    b = vecs[:, 0]
    B11, B12, B22, B13, B23, B33 = b
    v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 * B12)
    lam = B33 - (B13 * B13 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = jnp.sqrt(jnp.abs(lam / B11))
    beta = jnp.sqrt(jnp.abs(lam * B11 / (B11 * B22 - B12 * B12)))
    gamma = -B12 * alpha * alpha * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha * alpha / lam
    K = jnp.array([
        [alpha, gamma, u0],
        [0.0, beta, v0],
        [0.0, 0.0, 1.0],
    ])
    return K


def _extrinsics_from_homography(H, K):
    """r1 = λK⁻¹h1, r2 = λK⁻¹h2, r3 = r1×r2, t = λK⁻¹h3; orthogonalize."""
    Kinv = jnp.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(Kinv @ h1), 1e-12)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    r3 = jnp.cross(r1, r2)
    Q = jnp.stack([r1, r2, r3], axis=1)
    # Nearest rotation via SVD.
    U, _, Vt = jnp.linalg.svd(Q)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    t = lam * (Kinv @ h3)
    # Keep the board in front of the camera.
    flip = jnp.sign(t[2])
    t = t * flip
    R = jnp.where(flip < 0, R @ jnp.diag(jnp.array([-1.0, -1.0, 1.0])), R)
    return matrix_to_rodrigues(R), t


def _project(params, obj_xy, n_views):
    """Reproject the planar grid under packed params → [V, N, 2] pixels."""
    fx, fy, cx, cy, skew = params[0:5]
    dist = params[5:10]
    ext = params[10:].reshape(n_views, 6)
    obj = jnp.concatenate(
        [obj_xy, jnp.zeros(obj_xy.shape[:-1] + (1,), obj_xy.dtype)], -1)

    def one(view_ext):
        R = rodrigues_to_matrix(view_ext[:3])
        cam = obj @ R.T + view_ext[3:]
        z = jnp.where(jnp.abs(cam[:, 2]) < 1e-9, 1e-9, cam[:, 2])
        xy = cam[:, :2] / z[:, None]
        xy = distort_normalized(xy, dist)
        u = fx * xy[:, 0] + skew * xy[:, 1] + cx
        v = fy * xy[:, 1] + cy
        return jnp.stack([u, v], -1)

    return jax.vmap(one)(ext)


@functools.partial(jax.jit, static_argnames=("config",))
@_highest_matmul_precision
def calibrate_camera(obj_xy, img_points, point_valid=None, view_valid=None,
                     config: CalibConfig = CalibConfig()) -> CalibrationResult:
    """obj_xy: [N, 2] planar grid (the z=0 pattern, helpers.rs:38-46);
    img_points: [V, N, 2] detected corners per view.

    Returns intrinsics + distortion + per-view extrinsics + RMS px error.
    """
    obj_xy = jnp.asarray(obj_xy, jnp.float32)
    img_points = jnp.asarray(img_points, jnp.float32)
    n_views, n_pts = img_points.shape[0], img_points.shape[1]
    if point_valid is None:
        point_valid = jnp.ones((n_views, n_pts), bool)
    if view_valid is None:
        view_valid = jnp.ones((n_views,), bool)
    pv = point_valid & view_valid[:, None]

    # 1. Per-view homographies (weighted DLT handles masked corners).
    Hs = jax.vmap(lambda ip, w: dlt_homography(obj_xy, ip, w))(
        img_points, pv.astype(jnp.float32))

    # 2. Closed-form intrinsics; 3. extrinsics.
    K0 = _intrinsics_from_homographies(Hs, view_valid)
    rvecs0, tvecs0 = jax.vmap(lambda H: _extrinsics_from_homography(H, K0))(Hs)

    # 4. Joint LM refinement.
    params0 = jnp.concatenate([
        jnp.stack([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2], K0[0, 1]]),
        jnp.zeros(5, jnp.float32),
        jnp.concatenate([rvecs0, tvecs0], -1).reshape(-1),
    ]).astype(jnp.float32)

    w_flat = pv.astype(jnp.float32).reshape(-1)

    def residuals(p):
        proj = _project(p, obj_xy, n_views)
        r = (proj - img_points).reshape(-1, 2)
        return (r * w_flat[:, None]).reshape(-1)

    n_params = params0.shape[0]

    def lm_step(state, _):
        p, lam = state
        r = residuals(p)
        J = jax.jacfwd(residuals)(p)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ)) + \
            1e-9 * jnp.eye(n_params, dtype=p.dtype)
        delta = jnp.linalg.solve(A, g)
        p_new = p - delta
        cost_old = jnp.sum(r * r)
        r_new = residuals(p_new)
        cost_new = jnp.sum(r_new * r_new)
        improved = (cost_new < cost_old) & jnp.all(jnp.isfinite(p_new))
        p = jnp.where(improved, p_new, p)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        return (p, lam), None

    (params, _), _ = jax.lax.scan(
        lm_step, (params0, jnp.float32(config.lm_lambda0)),
        None, length=config.lm_iters)

    fx, fy, cx, cy, skew = params[0:5]
    dist = params[5:10]
    ext = params[10:].reshape(n_views, 6)
    K = jnp.array([[fx, skew, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])

    r = residuals(params).reshape(-1, 2)
    n_valid = jnp.maximum(jnp.sum(w_flat), 1.0)
    rms = jnp.sqrt(jnp.sum(jnp.sum(r * r, -1)) / n_valid)
    ok = jnp.isfinite(rms) & (jnp.sum(view_valid) >= 3)
    return CalibrationResult(
        camera=CameraModel(K=K, dist=dist),
        rvecs=ext[:, :3], tvecs=ext[:, 3:], rms=rms, ok=ok)


def planar_grid(nx: int, ny: int, square: float = 1.0):
    """The z=0 object grid (img_points_from_size, calibrator
    helpers.rs:38-46): row-major (x fastest) corner coordinates."""
    ys, xs = jnp.mgrid[0:ny, 0:nx]
    return (jnp.stack([xs, ys], -1).reshape(-1, 2) * square).astype(jnp.float32)
