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
from cubesat_apds_tpu.ops.geometry.linalg_small import eigh3x3, lstsq_normal


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
    _, eigvec = eigh3x3(cov)   # custom-call-free (vmapped in RANSAC)
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


def ortho_pose_candidates(obj_points, img_points_normalized, weights=None):
    """Both scaled-orthographic (POS) pose candidates.

    The planar-POS two-fold ambiguity is EXACT in the orthographic
    limit: (c1, c2) and (−c1, −c2) reproject identically under weak
    perspective, and only perspective effects (or external constraints —
    solve_pnp_ransac's above-terrain gate) separate them. Returning BOTH
    lets the RANSAC scoring recover the physical pose when the
    reprojection tie-break would pick the mirror (VERDICT r4 missing #2:
    recover, don't refuse).

    Returns (R [2,3,3], t [2,3], ok) — candidate 0 is (c1, c2).
    """
    obj = jnp.asarray(obj_points)
    uv = jnp.asarray(img_points_normalized, obj.dtype)
    n = obj.shape[0]
    w = jnp.ones((n,), obj.dtype) if weights is None else \
        jnp.asarray(weights, obj.dtype)

    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c = jnp.sum(obj * w[:, None], axis=0) / wsum
    # Fit in the PCA PLANE basis: for (near-)planar scenes the affine
    # map's normal-direction coefficients are unobservable — a naive
    # 3-D fit fills them with damped-least-squares noise and wrecks the
    # pose (planar-POS degeneracy). Everything observable lives in the
    # [e1, e2] span; the rotation's out-of-plane components come back
    # from orthonormality below.
    centered = (obj - c) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered / wsum
    _, eigvec = eigh3x3(cov)
    e1 = eigvec[:, 2]
    e2 = eigvec[:, 1]
    nrm = jnp.cross(e1, e2)
    p2 = jnp.stack([(obj - c) @ e1, (obj - c) @ e2], axis=-1)   # [n, 2]
    X = jnp.concatenate([p2, jnp.ones((n, 1), obj.dtype)], axis=1)
    sw = jnp.sqrt(w)[:, None]
    coef_u = lstsq_normal(X * sw, uv[:, 0] * sw[:, 0])           # [3]
    coef_v = lstsq_normal(X * sw, uv[:, 1] * sw[:, 0])
    a1p = coef_u[:2]
    a2p = coef_v[:2]
    b = jnp.stack([coef_u[2], coef_v[2]])

    # Scaled-orthographic closed form for a planar scene (Oberkampf
    # POSIT / IPPE family): rows r_i = (a_ip/s, c_i) in the plane frame
    # with |r_i| = 1, r1·r2 = 0 ⇒ s² is the larger root of
    # s⁴ − (g11+g22)s² + (g11·g22 − g12²) = 0.
    g11 = jnp.dot(a1p, a1p)
    g22 = jnp.dot(a2p, a2p)
    g12 = jnp.dot(a1p, a2p)
    disc = jnp.sqrt(jnp.maximum((g11 - g22) ** 2 + 4.0 * g12 * g12, 0.0))
    s2 = 0.5 * (g11 + g22 + disc)
    s2 = jnp.maximum(s2, 1e-24)
    s = jnp.sqrt(s2)
    c1 = jnp.sqrt(jnp.maximum(1.0 - g11 / s2, 0.0))
    c2m = jnp.sqrt(jnp.maximum(1.0 - g22 / s2, 0.0))
    c2 = jnp.where(c1 > 1e-9, -g12 / (s2 * jnp.maximum(c1, 1e-20)),
                   c2m)

    def pose(c1s, c2s):
        r1 = (a1p[0] * e1 + a1p[1] * e2) / s + c1s * nrm
        r2 = (a2p[0] * e1 + a2p[1] * e2) / s + c2s * nrm
        # Orthonormalize residual numeric drift.
        r1 = r1 / jnp.maximum(jnp.linalg.norm(r1), 1e-20)
        r2 = r2 - jnp.dot(r1, r2) * r1
        r2 = r2 / jnp.maximum(jnp.linalg.norm(r2), 1e-20)
        r3 = jnp.cross(r1, r2)
        R = jnp.stack([r1, r2, r3], axis=0)
        tz = 1.0 / s
        t = jnp.concatenate([b * tz, jnp.asarray([tz], obj.dtype)]) \
            - R @ c
        return R, t

    Ra, ta = pose(c1, c2)
    Rb, tb = pose(-c1, -c2)
    R2 = jnp.stack([Ra, Rb])
    t2 = jnp.stack([ta, tb])
    ok = jnp.all(jnp.isfinite(R2)) & jnp.all(jnp.isfinite(t2)) & (s > 0)
    return R2, t2, ok


def ortho_pose(obj_points, img_points_normalized, weights=None):
    """Weak-perspective (scaled-orthographic / POS) pose.

    The nadir-looking satellite limit: when scene depth ≪ camera
    distance, the image is an AFFINE function of the world points and
    every perspective minimal solver degenerates (the true camera sits
    near infinity; an exact map crop of a geo-referenced mosaic is this
    limit exactly). Fit uv ≈ A·X + b by weighted least squares, read the
    pose out of the affine map: A = [r₁; r₂]/t_z, b = [t_x, t_y]/t_z.
    Attitude (the mission output) comes out well-conditioned; range
    (t_z) is the 1/scale estimate. Competes in solve_pnp_ransac's
    scoring; the Gauss-Newton polish restores full perspective.

    Resolves the planar-POS mirror ambiguity by weighted perspective
    reprojection error (callers needing BOTH candidates — mirror-pose
    recovery — use ortho_pose_candidates).
    """
    obj = jnp.asarray(obj_points)
    uv = jnp.asarray(img_points_normalized, obj.dtype)
    n = obj.shape[0]
    w = jnp.ones((n,), obj.dtype) if weights is None else \
        jnp.asarray(weights, obj.dtype)
    R2, t2, ok = ortho_pose_candidates(obj, uv, w)

    def werr(R, t):
        cam = obj @ R.T + t
        z = jnp.where(jnp.abs(cam[:, 2]) < 1e-12, 1e-12, cam[:, 2])
        uv_hat = cam[:, :2] / z[:, None]
        e = jnp.sum((uv_hat - uv) ** 2, axis=-1)
        e = jnp.where(cam[:, 2] <= 0, 1e12, e)
        return jnp.sum(e * w)

    use_b = werr(R2[1], t2[1]) < werr(R2[0], t2[0])
    R = jnp.where(use_b, R2[1], R2[0])
    t_full = jnp.where(use_b, t2[1], t2[0])
    return R, t_full, ok
