"""Batched EPnP: pose from n≥4 3D–2D correspondences, no iterative init.

TPU-native replacement for OpenCV SOLVEPNP_EPNP, the default solver inside
pnp_solver_ransac (reference: homographier/src/homographier/mod.rs:347-361).
Everything is fixed-shape small linear algebra (12×12 eigh, 3×3 SVD) so the
whole solver batches over hypotheses with vmap (SURVEY.md §7 hard part #4).

Algorithm (Lepetit, Moreno-Noguer, Fua — "EPnP: An Accurate O(n) Solution
to the PnP Problem", IJCV 2009):
  1. Express world points barycentrically in 4 control points.
  2. 2n×12 linear system M x = 0 on camera-frame control points.
  3. Candidate solutions from the ≤4-dim nullspace of MᵀM; solve the β
     combination cases N ∈ {1, 2, 3}, Gauss-Newton refine.
  4. Absolute orientation (Horn/Procrustes) world → camera for each case,
     keep the lowest-reprojection-error pose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.ops.geometry.linalg_small import (
    cholesky_solve,
    det3x3,
    eigh3x3,
    eigh_smallest,
    lstsq_normal,
    polar_rotation,
)
from cubesat_apds_tpu.ops.geometry.rodrigues import matrix_to_rodrigues

# Control-point distance constraint index pairs (6 pairs of 4 points).
_PAIRS = jnp.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])


def _control_points(obj, w):
    """Centroid + principal-axis control points of weighted world points."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    c0 = jnp.sum(obj * w[:, None], axis=0) / wsum
    centered = (obj - c0) * w[:, None]
    cov = centered.T @ centered / wsum
    # Custom-call-free 3×3 Jacobi (vmapped over RANSAC hypotheses — the
    # LAPACK eigh custom-call's fixed overhead dominates at this size).
    eigval, eigvec = eigh3x3(cov)
    # Scale axes by sqrt of eigenvalues, FLOORED RELATIVE to the largest:
    # planar point sets (the satellite ground-patch case) would otherwise
    # collapse a control point onto the plane and make the barycentric
    # system singular (NaN poses in f32).
    eig_max = jnp.maximum(eigval[-1], 1e-12)
    scale = jnp.sqrt(jnp.maximum(eigval, 1e-4 * eig_max))
    cpts = c0[None, :] + eigvec.T * scale[:, None]
    return jnp.concatenate([c0[None, :], cpts], axis=0)  # [4, 3]


def _barycentric(obj, cw):
    """α s.t. obj = α @ cw, Σα = 1. Solve the 4×4 system via normal
    equations (custom-call-free; control points are well-conditioned by
    construction so the squared condition number is benign)."""
    A = jnp.concatenate([cw.T, jnp.ones((1, 4), cw.dtype)], axis=0)   # [4,4]
    b = jnp.concatenate([obj.T, jnp.ones((1, obj.shape[0]), obj.dtype)], axis=0)
    AtA = A.T @ A
    # Damping relative to the matrix scale keeps α bounded for
    # ill-conditioned (near-planar) control points in f32.
    damp = 1e-9 * (AtA[0, 0] + AtA[1, 1] + AtA[2, 2] + AtA[3, 3])
    alpha = cholesky_solve(AtA + damp * jnp.eye(4, dtype=AtA.dtype),
                           A.T @ b)                                    # [4, n]
    return alpha.T                                                     # [n, 4]


def _build_M(alpha, uv_n, w):
    """2n×12 EPnP design matrix from normalized image coords (fx=fy=1,c=0)."""
    n = alpha.shape[0]
    u = uv_n[:, 0]
    v = uv_n[:, 1]
    zeros = jnp.zeros_like(alpha)
    # Row pairs: [α_j, 0, -u α_j] and [0, α_j, -v α_j] interleaved over j.
    r1 = jnp.stack([alpha, zeros, -u[:, None] * alpha], axis=-1)  # [n,4,3]
    r2 = jnp.stack([zeros, alpha, -v[:, None] * alpha], axis=-1)
    M = jnp.concatenate([r1.reshape(n, 12), r2.reshape(n, 12)], axis=0)
    wrep = jnp.concatenate([w, w], axis=0)[:, None]
    return M * wrep


def _cam_points_from_x(x, alpha):
    """Camera-frame control points x [12] → per-point camera coords [n,3]."""
    cc = x.reshape(4, 3)
    return alpha @ cc


def _pairwise_dists(pts4):
    d = pts4[_PAIRS[:, 0]] - pts4[_PAIRS[:, 1]]
    return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-18))


def _procrustes(src, dst, w, fast: bool = False):
    """Weighted rigid alignment: R, t minimizing ||R·src + t − dst||².

    fast=True replaces the 3×3 SVD custom-call with a Newton polar
    iteration (pure VPU arithmetic). The polar factor equals the
    Procrustes optimum whenever det(S) > 0; reflection cases come out
    with det −1 and score as degenerate RANSAC hypotheses — the exact
    SVD path is kept for the final (accuracy-critical) refit.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    S = ((dst - mu_d) * w[:, None]).T @ (src - mu_s)
    if fast:
        R = polar_rotation(S)
    else:
        U, _, Vt = jnp.linalg.svd(S)
        d = jnp.sign(jnp.linalg.det(U @ Vt))
        D = jnp.diag(jnp.array([1.0, 1.0, 0.0], S.dtype)) + jnp.diag(
            jnp.array([0.0, 0.0, 1.0], S.dtype)) * d
        R = U @ D @ Vt
    t = mu_d - R @ mu_s
    return R, t


def _gauss_newton_betas(betas, vmat, rho, iters: int = 5):
    """Refine β (4-vector): minimize Σ (||c_i−c_j||²(β) − ρ_ij)²."""

    def dists_sq(b):
        x = vmat @ b
        cc = x.reshape(4, 3)
        d = cc[_PAIRS[:, 0]] - cc[_PAIRS[:, 1]]
        return jnp.sum(d * d, axis=-1)

    def body(_, b):
        r = dists_sq(b) - rho
        J = jax.jacfwd(dists_sq)(b)          # [6, 4]
        JtJ = J.T @ J
        delta = cholesky_solve(JtJ, J.T @ r, damp=1e-9)
        return b - delta

    return jax.lax.fori_loop(0, iters, body, betas)


def epnp(obj_points, img_points_normalized, weights=None,
         fast: bool = False):
    """EPnP pose solve.

    obj_points: [n, 3] world; img_points_normalized: [n, 2] (K-removed);
    weights: [n] (0 masks). fast=True swaps the Procrustes SVD for a
    polar iteration (hypothesis-batch mode). Returns (R [3,3], t [3], ok).
    """
    obj = jnp.asarray(obj_points)
    uv = jnp.asarray(img_points_normalized, obj.dtype)
    n = obj.shape[0]
    w = jnp.ones((n,), obj.dtype) if weights is None else jnp.asarray(weights, obj.dtype)

    cw = _control_points(obj, w)
    alpha = _barycentric(obj, cw)
    M = _build_M(alpha, uv, w)
    MtM = M.T @ M
    # 4 smallest eigvecs [12,4] via custom-call-free inverse iteration
    # (PERF.md roadmap: the 12×12 eigh custom-call cost ~0.6 ms/frame at
    # RANSAC hypothesis batch sizes — measured round 2 A/B).
    V = eigh_smallest(MtM, 4)

    rho = _pairwise_dists(cw) ** 2                     # world control distances²

    def case_betas_1():
        v = V[:, 0]
        cc = v.reshape(4, 3)
        d = cc[_PAIRS[:, 0]] - cc[_PAIRS[:, 1]]
        dv = jnp.sum(d * d, axis=-1)
        beta = jnp.sum(jnp.sqrt(jnp.maximum(dv, 1e-18)) * jnp.sqrt(rho)) / jnp.maximum(
            jnp.sum(dv), 1e-18)
        return jnp.array([beta, 0.0, 0.0, 0.0], obj.dtype)

    def _dv(i, j):
        ci = V[:, i].reshape(4, 3)
        cj = V[:, j].reshape(4, 3)
        di = ci[_PAIRS[:, 0]] - ci[_PAIRS[:, 1]]
        dj = cj[_PAIRS[:, 0]] - cj[_PAIRS[:, 1]]
        return jnp.sum(di * dj, axis=-1)               # [6]

    def _lsq(L, b):
        """Small least squares via normal equations + unrolled Cholesky
        (lstsq/solve would be slow TPU custom-calls; systems are ≤6×6)."""
        return lstsq_normal(L, b, damp=1e-9)

    def case_betas_2():
        # Unknowns [β1², β1β2, β2²]; 6×3 least squares.
        L = jnp.stack([_dv(0, 0), 2 * _dv(0, 1), _dv(1, 1)], axis=-1)
        sol = _lsq(L, rho)
        b1 = jnp.sqrt(jnp.maximum(jnp.abs(sol[0]), 1e-18))
        b2 = jnp.sqrt(jnp.maximum(jnp.abs(sol[2]), 1e-18)) * jnp.sign(sol[1]) * jnp.sign(sol[0])
        return jnp.array([b1, b2, 0.0, 0.0], obj.dtype)

    def case_betas_3():
        # Unknowns [β1², β1β2, β2², β1β3, β2β3, β3²]; 6×6 solve.
        L = jnp.stack(
            [_dv(0, 0), 2 * _dv(0, 1), _dv(1, 1), 2 * _dv(0, 2), 2 * _dv(1, 2),
             _dv(2, 2)], axis=-1)
        sol = _lsq(L, rho)
        b1 = jnp.sqrt(jnp.maximum(jnp.abs(sol[0]), 1e-18))
        b2 = jnp.sqrt(jnp.maximum(jnp.abs(sol[2]), 1e-18)) * jnp.sign(sol[1]) * jnp.sign(sol[0])
        b3 = jnp.sqrt(jnp.maximum(jnp.abs(sol[5]), 1e-18)) * jnp.sign(sol[3]) * jnp.sign(sol[0])
        return jnp.array([b1, b2, b3, 0.0], obj.dtype)

    def pose_from_betas(betas):
        betas = _gauss_newton_betas(betas, V, rho)
        x = V @ betas
        cam = _cam_points_from_x(x, alpha)             # [n, 3]
        # Enforce positive depth: EPnP nullspace sign is arbitrary.
        depth_sign = jnp.sign(jnp.sum(cam[:, 2] * w) + 1e-18)
        cam = cam * depth_sign
        R, t = _procrustes(obj, cam, w, fast=fast)
        proj = obj @ R.T + t
        z = jnp.where(jnp.abs(proj[:, 2]) < 1e-12, 1e-12, proj[:, 2])
        uv_hat = proj[:, :2] / z[:, None]
        err = jnp.sum(jnp.sum((uv_hat - uv) ** 2, axis=-1) * w)
        return R, t, err

    # The three beta initializations are independent: vmap them into ONE
    # batched chain instead of three sequential ones — the solver is
    # dispatch-depth-bound at these op sizes, not FLOP-bound (3× fewer
    # kernels both unbatched refits and under the RANSAC hypothesis vmap).
    cases = jnp.stack([case_betas_1(), case_betas_2(), case_betas_3()])
    Rs, ts, errs = jax.vmap(pose_from_betas)(cases)
    errs = jnp.where(jnp.isfinite(errs), errs, jnp.inf)
    best = jnp.argmin(errs)
    R_best = Rs[best]
    # Validity requires an actual ROTATION: the fast polar-iteration
    # Procrustes can diverge on degenerate (near-affine/collinear)
    # samples and return a scaled non-rigid map — which can still
    # reproject many points at ill-conditioned geometry and win RANSAC
    # scoring, only to be destroyed by the Rodrigues round trip
    # (observed: a det=136 "rotation" winning with 42 inliers).
    ortho_err = jnp.max(jnp.abs(R_best.T @ R_best - jnp.eye(3, dtype=R_best.dtype)))
    ok = jnp.isfinite(errs[best]) & (ortho_err < 0.1) & \
        (jnp.abs(det3x3(R_best) - 1.0) < 0.5)
    return R_best, ts[best], ok


def epnp_rvec_tvec(obj_points, img_points_normalized, weights=None):
    R, t, ok = epnp(obj_points, img_points_normalized, weights)
    return matrix_to_rodrigues(R), t, ok
