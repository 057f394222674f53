"""Planar PnP: pose from coplanar 3D points via homography decomposition.

EPnP degrades on (near-)coplanar point sets — which is the NOMINAL
satellite localization case: ground keypoints on a low-relief patch are
almost a plane in ECEF. OpenCV handles this by switching solvers
(SOLVEPNP_IPPE); here the planar solution is computed alongside EPnP and
the lower-reprojection-error pose wins (branchless, jit-friendly).

Method: fit the best plane (PCA), express points in plane coordinates,
DLT homography plane → normalized image, decompose H = [r₁ r₂ t]
(Zhang extrinsics, orthonormalized), compose with the plane frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from cubesat_apds_tpu.ops.geometry.homography import dlt_homography_solve


def planar_pose(obj_points, img_points_normalized, weights=None):
    """Pose assuming (near-)coplanar obj points.

    obj_points [n, 3], img_points_normalized [n, 2], weights [n].
    Returns (R [3,3], t [3], ok). Accuracy degrades gracefully with
    out-of-plane variance — callers score against alternatives.
    """
    obj = jnp.asarray(obj_points)
    uv = jnp.asarray(img_points_normalized, obj.dtype)
    n = obj.shape[0]
    w = jnp.ones((n,), obj.dtype) if weights is None else \
        jnp.asarray(weights, obj.dtype)

    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c = jnp.sum(obj * w[:, None], axis=0) / wsum
    centered = (obj - c) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered / wsum
    _, eigvec = jnp.linalg.eigh(cov)
    # In-plane axes = two largest eigenvectors; E: world → plane coords.
    e1 = eigvec[:, 2]
    e2 = eigvec[:, 1]
    p2 = jnp.stack([(obj - c) @ e1, (obj - c) @ e2], axis=-1)  # [n, 2]

    H = dlt_homography_solve(p2, uv, w)

    # Decompose H = λ·[r1 r2 t] (normalized camera: K = I).
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(h1), 1e-12)
    r1 = h1 * lam
    r2raw = h2 * lam
    # Orthonormalize r2 against r1 (Gram–Schmidt), r3 = r1×r2.
    r2 = r2raw - jnp.dot(r1, r2raw) * r1
    r2 = r2 / jnp.maximum(jnp.linalg.norm(r2), 1e-12)
    r3 = jnp.cross(r1, r2)
    Rp = jnp.stack([r1, r2, r3], axis=1)          # plane → camera
    t = h3 * lam
    # Cheirality: plane origin must sit in front of the camera.
    flip = jnp.where(t[2] < 0, -1.0, 1.0)
    t = t * flip
    Rp = jnp.where(flip < 0,
                   Rp @ jnp.diag(jnp.asarray([-1.0, -1.0, 1.0], Rp.dtype)),
                   Rp)

    # Compose with the plane frame: x_cam = Rp·Eᵀ·(x − c) + t.
    E = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=1)  # world → plane
    R = Rp @ E.T
    t_full = t - R @ c
    ok = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t_full))
    return R, t_full, ok
