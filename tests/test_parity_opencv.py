"""Parity tests against OpenCV — the reference's actual native backend.

The reference delegates all compute to OpenCV (SURVEY.md §2.2); these
tests run the SAME inputs through cv2 and through our TPU-native ops:

  * BFMatcher NORM_HAMMING knn + ratio (get_knn_matches semantics,
    feature_extraction/src/lib.rs:94-114): expected BIT-EXACT.
  * BFMatcher crosscheck (get_bruteforce_matches, lib.rs:116-126):
    expected bit-exact.
  * findHomography RANSAC (find_homography_mat, homographier
    mod.rs:231-259): inlier-set agreement (both RANSACs are randomized;
    the north-star metric is ≥95% inlier agreement, BASELINE.md).
  * solvePnPRansac EPnP (pnp_solver_ransac, mod.rs:320-369): pose
    agreement.
  * calibrateCamera (calibrator main.rs:65-74): intrinsics agreement.
  * findChessboardCorners (main.rs:44-55): corner-set agreement.

cv2 5.0 in this environment has no AKAZE (moved to contrib); detector
parity is covered structurally in test_akaze.py instead.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from cubesat_apds_tpu.core.config import DESC_BYTES, PnPConfig, RansacConfig
from cubesat_apds_tpu.core.types import CameraModel, Correspondences
from cubesat_apds_tpu.ops import match as M
from cubesat_apds_tpu.ops.geometry.homography import find_homography_ransac
from cubesat_apds_tpu.ops.geometry.pnp import solve_pnp_ransac
from cubesat_apds_tpu.ops.geometry.rodrigues import rodrigues_to_matrix
from cubesat_apds_tpu.ops.warp import apply_homography


def _rand_desc(rng, n):
    return rng.integers(0, 256, size=(n, DESC_BYTES), dtype=np.uint8)


# --- Matching: bit-exact parity -----------------------------------------

def test_knn_match_parity(rng):
    q = _rand_desc(rng, 200)
    db = _rand_desc(rng, 500)
    ratio = 0.8

    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    cv_matches = bf.knnMatch(q, db, k=2)
    cv_good = {(m[0].queryIdx, m[0].trainIdx, m[0].distance)
               for m in cv_matches if m[0].distance < m[1].distance * ratio}

    ours = M.knn_match(q, db, ratio=ratio)
    ok = np.asarray(ours.valid)
    our_good = {(int(i), int(t), float(d)) for i, t, d in zip(
        np.asarray(ours.query_idx)[ok], np.asarray(ours.train_idx)[ok],
        np.asarray(ours.distance)[ok])}
    assert our_good == cv_good


def test_knn_distances_parity(rng):
    q = _rand_desc(rng, 64)
    db = _rand_desc(rng, 256)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    cv_matches = bf.knnMatch(q, db, k=2)
    d0_cv = np.array([m[0].distance for m in cv_matches])
    d1_cv = np.array([m[1].distance for m in cv_matches])
    i0_cv = np.array([m[0].trainIdx for m in cv_matches])
    d0, d1, i0 = M.knn2(M.unpack_bits(q), M.unpack_bits(db))
    np.testing.assert_array_equal(np.asarray(d0), d0_cv)
    np.testing.assert_array_equal(np.asarray(d1), d1_cv)
    np.testing.assert_array_equal(np.asarray(i0), i0_cv)


def test_crosscheck_match_parity(rng):
    q = _rand_desc(rng, 150)
    db = _rand_desc(rng, 150)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    cv_matches = bf.match(q, db)
    cv_set = {(m.queryIdx, m.trainIdx) for m in cv_matches}
    ours = M.crosscheck_match(q, db)
    ok = np.asarray(ours.valid)
    our_set = set(zip(np.asarray(ours.query_idx)[ok].tolist(),
                      np.asarray(ours.train_idx)[ok].tolist()))
    assert our_set == cv_set


def test_blockwise_matches_cv(rng):
    q = _rand_desc(rng, 64)
    db = _rand_desc(rng, 1024)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    cv_matches = bf.knnMatch(q, db, k=1)
    i0_cv = np.array([m[0].trainIdx for m in cv_matches])
    _, _, i0 = M.knn2_blockwise(M.unpack_bits(q), M.unpack_bits(db), 256)
    np.testing.assert_array_equal(np.asarray(i0), i0_cv)


# --- Homography: inlier-set agreement -----------------------------------

def test_homography_inlier_agreement(rng):
    H_true = np.array([[0.9, 0.08, 15.0], [-0.06, 1.05, -8.0],
                       [4e-5, -6e-5, 1.0]])
    n_in, n_out = 120, 60
    src_in = rng.uniform(0, 500, (n_in, 2)).astype(np.float32)
    dst_in = np.asarray(apply_homography(jnp.asarray(H_true),
                                         jnp.asarray(src_in))).astype(np.float32)
    dst_in = dst_in + rng.normal(0, 0.8, dst_in.shape).astype(np.float32)
    src_out = rng.uniform(0, 500, (n_out, 2)).astype(np.float32)
    dst_out = rng.uniform(0, 500, (n_out, 2)).astype(np.float32)
    src = np.concatenate([src_in, src_out])
    dst = np.concatenate([dst_in, dst_out])

    H_cv, mask_cv = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    res = find_homography_ransac(jnp.asarray(src), jnp.asarray(dst))
    inl_us = np.asarray(res.inliers)
    inl_cv = mask_cv.ravel().astype(bool)

    # North-star: ≥95% inlier-set agreement (BASELINE.md).
    agreement = (inl_us == inl_cv).mean()
    assert agreement >= 0.95, f"inlier agreement {agreement:.3f}"
    # Homographies map test points to within 1px of each other.
    test_pts = rng.uniform(0, 500, (50, 2)).astype(np.float32)
    p_cv = np.asarray(apply_homography(jnp.asarray(H_cv, jnp.float64),
                                       jnp.asarray(test_pts)))
    p_us = np.asarray(apply_homography(jnp.asarray(np.asarray(res.H),
                                                   jnp.float64),
                                       jnp.asarray(test_pts)))
    assert np.linalg.norm(p_cv - p_us, axis=-1).max() < 1.0


def test_homography_rho_agreement(rng):
    """RHO/PROSAC (HomographyMethod::RHO, homographier mod.rs:25-31):
    distance-ordered progressive sampling must agree with cv2.RHO."""
    H_true = np.array([[1.02, -0.05, 10.0], [0.07, 0.95, 5.0],
                       [-3e-5, 5e-5, 1.0]])
    n_in, n_out = 140, 60
    src_in = rng.uniform(0, 500, (n_in, 2)).astype(np.float32)
    dst_in = np.asarray(apply_homography(jnp.asarray(H_true),
                                         jnp.asarray(src_in))).astype(np.float32)
    dst_in = dst_in + rng.normal(0, 0.6, dst_in.shape).astype(np.float32)
    src_out = rng.uniform(0, 500, (n_out, 2)).astype(np.float32)
    dst_out = rng.uniform(0, 500, (n_out, 2)).astype(np.float32)
    src = np.concatenate([src_in, src_out])
    dst = np.concatenate([dst_in, dst_out])
    # Quality ranks: inliers mostly better (smaller), as match distances
    # would be; some overlap to exercise the progressive pool.
    quality = np.concatenate([rng.uniform(0, 60, n_in),
                              rng.uniform(30, 100, n_out)]).astype(np.float32)

    H_cv, mask_cv = cv2.findHomography(src, dst, cv2.RHO, 3.0)
    res = find_homography_ransac(jnp.asarray(src), jnp.asarray(dst),
                                 method="rho",
                                 quality=jnp.asarray(quality))
    inl_us = np.asarray(res.inliers)
    inl_cv = mask_cv.ravel().astype(bool)
    agreement = (inl_us == inl_cv).mean()
    assert agreement >= 0.95, f"inlier agreement {agreement:.3f}"
    test_pts = rng.uniform(0, 500, (50, 2)).astype(np.float32)
    p_cv = np.asarray(apply_homography(jnp.asarray(H_cv, jnp.float64),
                                       jnp.asarray(test_pts)))
    p_us = np.asarray(apply_homography(jnp.asarray(np.asarray(res.H),
                                                   jnp.float64),
                                       jnp.asarray(test_pts)))
    assert np.linalg.norm(p_cv - p_us, axis=-1).max() < 1.0


# --- PnP: pose agreement -------------------------------------------------

def test_pnp_pose_agreement(rng):
    rvec_t = rng.normal(0, 0.3, 3)
    R = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec_t)))
    tvec_t = np.array([0.3, -0.2, 5.0])
    n, n_out = 100, 25
    obj = rng.uniform(-1, 1, (n, 3))
    cam_pts = obj @ R.T + tvec_t
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    pix = cam_pts[:, :2] / cam_pts[:, 2:3] * 700.0 + [320, 240]
    pix = pix + rng.normal(0, 0.4, pix.shape)
    pix[:n_out] = rng.uniform(0, 640, (n_out, 2))

    okcv, rvec_cv, tvec_cv, inl_cv = cv2.solvePnPRansac(
        obj.astype(np.float32), pix.astype(np.float32).reshape(-1, 1, 2),
        K, None, flags=cv2.SOLVEPNP_EPNP, reprojectionError=8.0)
    assert okcv

    camera = CameraModel(K=jnp.asarray(K, jnp.float32),
                         dist=jnp.zeros(5, jnp.float32))
    corr = Correspondences(obj_points=jnp.asarray(obj, jnp.float32),
                           img_points=jnp.asarray(pix, jnp.float32),
                           valid=jnp.ones(n, bool))
    sol = solve_pnp_ransac(corr, camera)
    assert bool(sol.ok)

    # Both should recover the true pose; compare to each other loosely
    # and to truth tightly.
    np.testing.assert_allclose(np.asarray(sol.rvec), rvec_t, atol=0.02)
    np.testing.assert_allclose(np.asarray(sol.tvec), tvec_t, atol=0.05)
    np.testing.assert_allclose(np.asarray(sol.rvec), rvec_cv.ravel(),
                               atol=0.04)
    np.testing.assert_allclose(np.asarray(sol.tvec), tvec_cv.ravel(),
                               atol=0.1)
    # Inlier agreement on the clean points.
    inl_us = np.asarray(sol.inliers)
    inl_cv_mask = np.zeros(n, bool)
    inl_cv_mask[inl_cv.ravel()] = True
    agreement = (inl_us == inl_cv_mask).mean()
    assert agreement >= 0.95, f"inlier agreement {agreement:.3f}"


# --- Calibration ---------------------------------------------------------

def test_calibration_parity(rng):
    from cubesat_apds_tpu.core.camera import distort_normalized
    from cubesat_apds_tpu.ops.geometry.calibration import (
        calibrate_camera, planar_grid)

    nx, ny = 7, 6
    K_true = np.array([[620.0, 0, 310.0], [0, 600.0, 250.0], [0, 0, 1.0]])
    dist_true = np.array([0.06, -0.02, 0.0, 0.0, 0.0])
    obj = np.asarray(planar_grid(nx, ny))
    obj3 = np.concatenate([obj, np.zeros((len(obj), 1))], -1).astype(np.float32)
    views = []
    for _ in range(12):
        rv = np.array([rng.normal(0, 0.15), rng.normal(0, 0.15),
                       rng.normal(0, 0.4)])
        R = np.asarray(rodrigues_to_matrix(jnp.asarray(rv)))
        t = np.array([rng.uniform(-2.5, -1), rng.uniform(-2.5, -1),
                      rng.uniform(9, 14)])
        cam = obj3 @ R.T + t
        xy = cam[:, :2] / cam[:, 2:3]
        xy = np.asarray(distort_normalized(jnp.asarray(xy),
                                           jnp.asarray(dist_true)))
        pix = xy * [620.0, 600.0] + [310.0, 250.0]
        views.append(pix.astype(np.float32))
    views = np.stack(views)

    rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
        [obj3] * 12, [v.reshape(-1, 1, 2) for v in views], (640, 480),
        None, None)

    res = calibrate_camera(jnp.asarray(obj), jnp.asarray(views))
    K_us = np.asarray(res.camera.K)
    np.testing.assert_allclose(K_us[0, 0], K_cv[0, 0], rtol=0.01)
    np.testing.assert_allclose(K_us[1, 1], K_cv[1, 1], rtol=0.01)
    np.testing.assert_allclose(K_us[0, 2], K_cv[0, 2], atol=4.0)
    np.testing.assert_allclose(K_us[1, 2], K_cv[1, 2], atol=4.0)
    d_us = np.asarray(res.camera.dist)
    np.testing.assert_allclose(d_us[0], dist_cv.ravel()[0], atol=0.02)
    assert float(res.rms) < max(2 * rms_cv, 0.2)


# --- Chessboard ----------------------------------------------------------

def test_chessboard_parity():
    from cubesat_apds_tpu.ops.geometry.chessboard import (
        find_chessboard_corners)

    nx, ny, cell = 7, 6, 24
    img = np.full((240, 320), 0.9, np.float32)
    for r in range(ny + 1):
        for c in range(nx + 1):
            shade = 0.1 if (r + c) % 2 == 0 else 0.9
            img[6 + r * cell:6 + (r + 1) * cell,
                16 + c * cell:16 + (c + 1) * cell] = shade
    img8 = (img * 255).astype(np.uint8)

    found_cv, corners_cv = cv2.findChessboardCorners(
        img8, (nx, ny), flags=cv2.CALIB_CB_ADAPTIVE_THRESH)
    corners_us, found_us = find_chessboard_corners(jnp.asarray(img), nx, ny)
    assert bool(found_us) and found_cv

    c_cv = corners_cv.reshape(-1, 2)
    c_us = np.asarray(corners_us)
    # Same set of corner locations (order may differ: cv2 scans its own
    # orientation) — nearest-neighbour distance under 1px both ways.
    d = np.linalg.norm(c_cv[:, None] - c_us[None, :], axis=-1)
    assert d.min(axis=1).max() < 1.0
    assert d.min(axis=0).max() < 1.0


def test_knn_k_parity(rng):
    """General k-NN (k=4) ordering matches cv2.BFMatcher.knnMatch
    exactly, including (distance, index) tie-breaking."""
    q = _rand_desc(rng, 40)
    db = np.concatenate([_rand_desc(rng, 100), q[:10]])  # planted ties
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    cv_matches = bf.knnMatch(q, db, k=4)
    d_cv = np.array([[m.distance for m in row] for row in cv_matches])
    i_cv = np.array([[m.trainIdx for m in row] for row in cv_matches])
    d, i = M.knn_matches_k(q, db, k=4)
    np.testing.assert_array_equal(np.asarray(d), d_cv)
    np.testing.assert_array_equal(np.asarray(i), i_cv)


def test_warp_perspective_parity(rng):
    """warp_perspective vs cv2.warpPerspective INTER_LINEAR /
    BORDER_CONSTANT (warp_image_perspective, homographier
    mod.rs:271-300). cv2 quantizes sample coordinates to 1/32 px
    (INTER_BITS=5), so parity on a smooth float image is to that
    quantization, not bit-exact; out-of-source pixels must be exactly
    the constant border on both sides."""
    from scipy import ndimage

    from cubesat_apds_tpu.ops.warp import warp_perspective

    img = ndimage.gaussian_filter(
        rng.random((120, 160)).astype(np.float32), 2.0)
    H = np.array([[0.95, 0.08, 6.0],
                  [-0.05, 1.04, -3.0],
                  [1.5e-4, -8e-5, 1.0]], np.float64)
    cv = cv2.warpPerspective(
        img, H, (160, 120), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    ours = np.asarray(warp_perspective(img, H, (120, 160)))

    # Border-constant region: pixels whose source point is outside the
    # image on both implementations must agree exactly (== 0).
    Hinv = np.linalg.inv(H)
    ys, xs = np.mgrid[0:120, 0:160]
    p = np.stack([xs, ys, np.ones_like(xs)], -1) @ Hinv.T
    sx = p[..., 0] / p[..., 2]
    sy = p[..., 1] / p[..., 2]
    outside = (sx < -1) | (sx > 160) | (sy < -1) | (sy > 120)
    assert (ours[outside] == 0).all() and (cv[outside] == 0).all()

    # Interior (≥1 px away from the in/out boundary): agreement to the
    # 1/32-px coordinate quantization times the local gradient.
    interior = (sx > 1) & (sx < 158) & (sy > 1) & (sy < 118)
    diff = np.abs(ours - cv)[interior]
    assert diff.max() < 0.02, diff.max()
    assert diff.mean() < 0.002, diff.mean()


def test_warp_perspective_channels_parity(rng):
    """Multi-channel (RGBA-like) warp parity — the reference warps BGRA
    Cmat<Vec4b> images (mod.rs:271-300); uint8 values compare within 1
    count after cv2's fixed-point blend."""
    from cubesat_apds_tpu.ops.warp import warp_perspective

    img = rng.integers(0, 256, (64, 80, 4), dtype=np.uint8)
    img = np.asarray(
        __import__("scipy.ndimage", fromlist=["gaussian_filter"])
        .gaussian_filter(img.astype(np.float32), (1.5, 1.5, 0)))
    H = np.array([[1.02, -0.03, -2.0],
                  [0.04, 0.97, 5.0],
                  [-1e-4, 5e-5, 1.0]], np.float64)
    cv = cv2.warpPerspective(img, H, (80, 64), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    ours = np.asarray(warp_perspective(img, H, (64, 80)))
    assert ours.shape == cv.shape
    # Same quantization argument, scaled by the 0..255 value range.
    assert np.abs(ours - cv).max() < 255 * 0.02
