"""PnP tests: EPnP accuracy, RANSAC robustness, degenerate inputs.

Mirrors reference geometry tests (homographier mod.rs:628-681: PnP errors
on <4 points; solve on hand-made correspondences)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubesat_apds_tpu.core.config import PnPConfig
from cubesat_apds_tpu.core.types import CameraModel, Correspondences
from cubesat_apds_tpu.ops.geometry.epnp import epnp
from cubesat_apds_tpu.ops.geometry.pnp import solve_pnp, solve_pnp_ransac
from cubesat_apds_tpu.ops.geometry.rodrigues import rodrigues_to_matrix


def _scene(rng, n=40, noise=0.0):
    """Random camera looking at a 3D point cloud; returns GT pose + data."""
    rvec = rng.normal(size=3) * 0.3
    R = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec)))
    tvec = np.array([0.2, -0.1, 4.0])
    obj = rng.uniform(-1, 1, (n, 3))
    cam = obj @ R.T + tvec
    uv_n = cam[:, :2] / cam[:, 2:3]
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    pix = uv_n * [800, 800] + [320, 240]
    if noise:
        pix = pix + rng.normal(0, noise, pix.shape)
    return rvec, tvec, obj, pix, K


def test_epnp_exact(rng):
    rvec, tvec, obj, pix, K = _scene(rng)
    uv_n = (pix - [320, 240]) / 800.0
    R, t, ok = epnp(jnp.asarray(obj), jnp.asarray(uv_n))
    assert bool(ok)
    R_true = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec)))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), tvec, atol=1e-4)


def test_solve_pnp_noisy(rng):
    rvec, tvec, obj, pix, K = _scene(rng, n=60, noise=0.5)
    cam = CameraModel(K=jnp.asarray(K, jnp.float32), dist=jnp.zeros(5, jnp.float32))
    corr = Correspondences(
        obj_points=jnp.asarray(obj, jnp.float32),
        img_points=jnp.asarray(pix, jnp.float32),
        valid=jnp.ones(60, bool),
    )
    sol = solve_pnp(corr, cam)
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.rvec), rvec, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sol.tvec), tvec, atol=2e-2)


def test_solve_pnp_ransac_with_outliers(rng):
    rvec, tvec, obj, pix, K = _scene(rng, n=80, noise=0.3)
    # Corrupt 30% of the observations.
    n_out = 24
    pix_bad = pix.copy()
    pix_bad[:n_out] = rng.uniform(0, 640, (n_out, 2))
    cam = CameraModel(K=jnp.asarray(K, jnp.float32), dist=jnp.zeros(5, jnp.float32))
    corr = Correspondences(
        obj_points=jnp.asarray(obj, jnp.float32),
        img_points=jnp.asarray(pix_bad, jnp.float32),
        valid=jnp.ones(80, bool),
    )
    sol = solve_pnp_ransac(corr, cam)
    assert bool(sol.ok)
    inl = np.asarray(sol.inliers)
    assert inl[n_out:].sum() >= 50        # true inliers kept
    assert inl[:n_out].sum() <= 3         # outliers rejected
    np.testing.assert_allclose(np.asarray(sol.rvec), rvec, atol=2e-2)
    np.testing.assert_allclose(np.asarray(sol.tvec), tvec, atol=5e-2)


def test_pnp_insufficient_points(rng):
    # Reference behavior: PnP errors on <4 points (mod.rs:628-638); we
    # report ok=False with static shapes.
    _, _, obj, pix, K = _scene(rng, n=8)
    cam = CameraModel(K=jnp.asarray(K, jnp.float32), dist=jnp.zeros(5, jnp.float32))
    valid = jnp.arange(8) < 3
    corr = Correspondences(
        obj_points=jnp.asarray(obj, jnp.float32),
        img_points=jnp.asarray(pix, jnp.float32),
        valid=valid,
    )
    sol = solve_pnp_ransac(corr, cam)
    assert not bool(sol.ok)


def test_pnp_honours_distortion(rng):
    # Unlike the reference (dist_coeffs shadowed by zeros, mod.rs:326,344),
    # distortion must be compensated: distorted observations with the
    # correct dist model should recover the same pose.
    from cubesat_apds_tpu.core.camera import distort_normalized

    rvec, tvec, obj, pix, K = _scene(rng, n=50)
    dist = jnp.asarray([0.1, -0.05, 0.001, 0.001, 0.0], jnp.float32)
    uv_n = (pix - [320, 240]) / 800.0
    uv_d = np.asarray(distort_normalized(jnp.asarray(uv_n), dist))
    pix_d = uv_d * [800, 800] + [320, 240]
    cam = CameraModel(K=jnp.asarray(K, jnp.float32), dist=dist)
    corr = Correspondences(
        obj_points=jnp.asarray(obj, jnp.float32),
        img_points=jnp.asarray(pix_d, jnp.float32),
        valid=jnp.ones(50, bool),
    )
    sol = solve_pnp(corr, cam)
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.rvec), rvec, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sol.tvec), tvec, atol=1e-2)


def test_epnp_rejects_non_rotation(rng):
    """Degenerate samples can make the fast polar Procrustes diverge to
    a scaled non-rigid map; epnp must report ok=False rather than let a
    det≠1 'rotation' win RANSAC scoring (found round 2: a det=136
    winner at near-affine geometry)."""
    # Nearly collinear points: Procrustes S is near rank-1.
    t = np.linspace(0, 1, 6)
    obj = np.stack([t, 2 * t + 1e-5 * rng.normal(size=6), 3 * t], 1)
    uv = rng.normal(size=(6, 2)) * 0.1
    R, tv, ok = epnp(jnp.asarray(obj, jnp.float32),
                     jnp.asarray(uv, jnp.float32), fast=True)
    RtR_err = float(np.abs(np.asarray(R).T @ np.asarray(R) - np.eye(3)).max())
    if RtR_err > 0.1:
        assert not bool(ok)


def test_pnp_near_orthographic_scene(rng):
    """The nadir-looking satellite limit: scene depth ≪ camera distance
    makes every perspective minimal solver degenerate; the global
    weak-perspective hypothesis (planar.ortho_pose) must recover the
    attitude. Models an exact map-crop: image = affine map of a
    far-away tilted plane."""
    from cubesat_apds_tpu.ops.geometry.rodrigues import rodrigues_to_matrix as _r2m

    rv_true = np.array([0.1, -2.2, 0.4])
    R_true = np.asarray(_r2m(jnp.asarray(rv_true)))
    n = 120
    # Planar scene patch (local z=0), kilometres across.
    obj_local = np.concatenate(
        [rng.uniform(-9000, 9000, (n, 2)), np.zeros((n, 1))], 1)
    obj = obj_local @ R_true.T          # tilt the plane in the world
    # Camera 20,000 km away along +z of the camera frame.
    t_true = np.array([120.0, -80.0, 2.1e7])
    cam_pts = obj @ np.eye(3) + t_true  # identity attitude, far camera
    uvn = cam_pts[:, :2] / cam_pts[:, 2:3]
    K = 300.0
    pix = (uvn * K + 128).astype(np.float32)
    corr = Correspondences(
        obj_points=jnp.asarray(obj, jnp.float32),
        img_points=jnp.asarray(pix),
        valid=jnp.ones(n, bool))
    cam = CameraModel.ideal(K, K, 128.0, 128.0)
    sol = solve_pnp_ransac(corr, cam, PnPConfig(num_hypotheses=64))
    assert bool(sol.ok)
    assert int(sol.num_inliers) >= n * 0.9
    # Attitude is the mission output: recovered R within ~1 degree.
    R_est = np.asarray(_r2m(sol.rvec))
    ang = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ np.eye(3)) - 1) / 2,
                                       -1, 1)))
    assert ang < 2.0, f"attitude error {ang:.2f} deg"
