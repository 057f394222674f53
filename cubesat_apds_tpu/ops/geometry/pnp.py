"""PnP-RANSAC: robust 6-DoF pose from 3D–2D correspondences.

Replaces pnp_solver_ransac (reference: homographier/src/homographier/
mod.rs:320-369, OpenCV solvePnPRansac with SOLVEPNP_EPNP). Differences by
design:
  * fixed hypothesis batch + seeded PRNG instead of adaptive sequential
    RANSAC (jit-static; SURVEY.md §7 hard part #2);
  * caller's dist_coeffs are HONOURED — the reference silently shadows
    them with zeros (mod.rs:326,344; SURVEY.md flags as do-not-replicate):
    we undistort image points up front, then work in normalized coords;
  * returns ok=False instead of Ok(None) when no solution (mod.rs:363).
"""

from __future__ import annotations

from cubesat_apds_tpu.ops.geometry.linalg_small import (
    highest_matmul_precision as _highest_matmul_precision)

import functools

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.core.config import PnPConfig
from cubesat_apds_tpu.core.types import CameraModel, Correspondences, PoseSolution
from cubesat_apds_tpu.core.camera import pixels_to_normalized
from cubesat_apds_tpu.ops.geometry.epnp import epnp
from cubesat_apds_tpu.ops.geometry.linalg_small import cholesky_solve
from cubesat_apds_tpu.ops.geometry.planar import (
    ortho_pose,
    ortho_pose_candidates,
    planar_pose,
)
from cubesat_apds_tpu.ops.geometry.rodrigues import (
    matrix_to_rodrigues,
    rodrigues_to_matrix,
)


def _apply_pose(R, t, obj):
    """cam = R·obj + t via ELEMENTWISE multiply-add — [..., 3, 3] × [N, 3].

    Deliberately not a matmul: pose scoring and GN residuals must be
    precision-mode-independent (K=3 contractions through the MXU carry
    mode-dependent rounding; the ground-truth harness measured the
    solver believing a 7°-off pose fit better than truth because its
    internal residuals disagreed with f64 by ~px). Three VPU
    multiply-adds per output are exact f32 and cost nothing at these
    shapes."""
    ox = obj[:, 0][:, None]                       # [N, 1]
    oy = obj[:, 1][:, None]
    oz = obj[:, 2][:, None]
    cam = (R[..., None, :, 0] * ox                # [..., N, 3]
           + R[..., None, :, 1] * oy
           + R[..., None, :, 2] * oz)
    return cam + t[..., None, :]


def _reproj_err_normalized(R, t, obj, uv_n):
    """Squared reprojection error in normalized image coords, [..., N]."""
    cam = _apply_pose(R, t, obj)
    z = cam[..., 2]
    behind = z <= 1e-6
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    uv_hat = cam[..., :2] / zs[..., None]
    err = jnp.sum((uv_hat - uv_n) ** 2, axis=-1)
    return jnp.where(behind, jnp.inf, err)


def _gn_refine_pose(rvec, tvec, obj, uv_n, weights, iters: int):
    """Gauss-Newton on (rvec, tvec) minimizing weighted reprojection error."""

    def residuals(params):
        rv, tv = params[:3], params[3:]
        R = rodrigues_to_matrix(rv)
        cam = _apply_pose(R, tv, obj)             # elementwise, see above
        z = jnp.where(jnp.abs(cam[:, 2]) < 1e-12, 1e-12, cam[:, 2])
        uv_hat = cam[:, :2] / z[:, None]
        return ((uv_hat - uv_n) * weights[:, None]).reshape(-1)

    def body(_, params):
        r = residuals(params)
        J = jax.jacfwd(residuals)(params)
        JtJ = J.T @ J
        # Unrolled Cholesky instead of the linalg.solve custom-call
        # (JtJ is 6×6 PSD; damping keeps it SPD at degenerate poses).
        delta = cholesky_solve(JtJ, J.T @ r, damp=1e-9)
        new = params - delta
        # MONOTONE acceptance: keep the step only if the weighted
        # residual norm decreases. Plain GN can drift along the
        # near-planar pose-ambiguity valley (flat cost, huge pose
        # changes) — measured live as a 7° attitude walk that the
        # inlier-count guard downstream cannot see (every point stays
        # under the loose threshold).
        ok = jnp.all(jnp.isfinite(new)) & \
            (jnp.sum(residuals(new) ** 2) < jnp.sum(r ** 2))
        return jnp.where(ok, new, params)

    params = jnp.concatenate([rvec, tvec])
    # Unrolled (iters is small + static): avoids lax.fori_loop's
    # per-iteration dispatch and lets XLA fuse across GN steps.
    for _ in range(iters):
        params = body(0, params)
    return params[:3], params[3:]


@functools.partial(jax.jit, static_argnames=("config",))
@_highest_matmul_precision
def solve_pnp_ransac(corr: Correspondences, camera: CameraModel,
                     config: PnPConfig = PnPConfig(), key=None,
                     up=None) -> PoseSolution:
    """RANSAC-EPnP over fixed-capacity correspondences.

    corr.obj_points [N,3], corr.img_points [N,2] pixels, corr.valid [N].

    `up` (optional [3] unit vector, world frame): physical-viability
    gate for hypothesis SELECTION — the camera center must sit on the
    +up side of the point centroid. This kills the near-planar pose
    ambiguity's mirror solution (camera below the terrain) while the
    physical candidate — which ortho_pose_candidates guarantees is in
    the hypothesis set — wins the scoring, instead of the pipeline
    merely flagging the mirror afterwards (VERDICT r4 missing #2).
    Callers with ECEF worlds pass the local up (≈ centroid direction);
    None disables the gate (unknown world orientation).
    """
    obj = jnp.asarray(corr.obj_points, jnp.float32)
    pix = jnp.asarray(corr.img_points, jnp.float32)
    valid = corr.valid
    n = obj.shape[0]
    if key is None:
        key = jax.random.PRNGKey(config.seed)

    uv_n = pixels_to_normalized(pix, camera)           # undistorted normalized
    vf = valid.astype(jnp.float32)
    num_valid = jnp.sum(valid.astype(jnp.int32))

    # Normalize the world frame to zero-centroid / unit-RMS: projection
    # is invariant to cam → cam/s, so solving with (obj − c)/s and
    # mapping t back as s·t_n − R·c is exact — and keeps the f32 solvers
    # conditioned for satellite geometry (ECEF-scale translations ~1e7 m
    # against ~1e3 m point spreads starve EPnP's nullspace resolution).
    c_obj = jnp.sum(obj * vf[:, None], axis=0) / jnp.maximum(jnp.sum(vf), 1.0)
    centered = (obj - c_obj) * vf[:, None]
    scale = jnp.sqrt(jnp.sum(centered * centered)
                     / jnp.maximum(jnp.sum(vf), 1.0))
    scale = jnp.maximum(scale, 1e-12)
    obj = (obj - c_obj) / scale

    # Normalized-coordinate threshold: pixel threshold / focal length.
    f_avg = 0.5 * (camera.K[0, 0] + camera.K[1, 1])
    thr2 = (config.reproj_threshold / f_avg) ** 2

    # --- Hypotheses: [H, S] index samples from the valid set (compact +
    # uniform ints; duplicates degrade that hypothesis only). ---
    valid_first = jnp.argsort(~valid).astype(jnp.int32)
    r = jax.random.randint(key, (config.num_hypotheses, config.sample_size),
                           0, jnp.maximum(num_valid, 1))
    samp = valid_first[r]

    def solve_one(idx):
        # fast=True: polar-iteration Procrustes — hypothesis batches are
        # throwaway; the winner is refit below with the exact solver.
        R, t, ok = epnp(obj[idx], uv_n[idx], fast=True)
        # Planar alternative: EPnP degrades on coplanar subsets (the
        # nominal flat-ground satellite case); both hypotheses compete
        # in the common reprojection scoring below.
        Rp, tp, okp = planar_pose(obj[idx], uv_n[idx])
        return jnp.stack([R, Rp]), jnp.stack([t, tp]), jnp.stack([ok, okp])

    Rs, ts, oks = jax.vmap(solve_one)(samp)            # [H,2,3,3],…
    Rs = Rs.reshape(-1, 3, 3)
    ts = ts.reshape(-1, 3)
    oks = oks.reshape(-1)

    # GLOBAL weak-perspective hypotheses from all valid points: in the
    # nadir-looking (near-affine) limit every perspective minimal sample
    # degenerates, while the affine fit is exact — they compete in the
    # same scoring and simply lose when perspective is strong or
    # outliers corrupt the global fit. BOTH planar-POS mirror candidates
    # enter the set: under the up-gate below, the physical one survives
    # even when weak perspective cannot separate them.
    R_o, t_o, ok_o = ortho_pose_candidates(obj, uv_n, vf)
    Rs = jnp.concatenate([Rs, R_o], axis=0)
    ts = jnp.concatenate([ts, t_o], axis=0)
    oks = jnp.concatenate([oks, jnp.stack([ok_o, ok_o])], axis=0)

    def _above(R, t):
        # Camera center −Rᵀt (the obj frame is zero-centered here) must
        # sit on the +up side; batched over leading dims.
        rt = jnp.sum(R * t[..., :, None], axis=-2)        # Rᵀ t
        return jnp.sum(-rt * up_n, axis=-1) > 0.0

    if up is not None:
        up_n = jnp.asarray(up, jnp.float32)
        oks = oks & _above(Rs, ts)

    # MSAC-style truncated-error scoring (lower is better): every
    # residual contributes min(err, thr2), so a pose that keeps the same
    # inlier COUNT but fits them worse scores worse. Pure inlier
    # counting is blind inside the near-planar pose-ambiguity valley —
    # poses 7° apart can hold the identical inlier set under the loose
    # pixel threshold (measured live via the ground-truth harness), and
    # tie-broken selection then picks an arbitrary valley member.
    def msac(R, t):
        err = _reproj_err_normalized(R, t, obj, uv_n)
        return jnp.sum(jnp.minimum(err, thr2) * vf[None, :], axis=-1), err

    scores_err, err = msac(Rs, ts)
    inl = (err < thr2) & valid[None, :]
    scores_err = jnp.where(oks, scores_err, jnp.inf)
    best = jnp.argmin(scores_err)
    R_best, t_best = Rs[best], ts[best]
    inliers = inl[best]
    s_best = scores_err[best]

    # --- Refit on the full inlier set (EPnP exact + planar + both POS
    # mirror candidates compete), then Gauss-Newton polish. ---
    w_inl = inliers.astype(jnp.float32)
    R_o2, t_o2, ok_o2 = ortho_pose_candidates(obj, uv_n, w_inl)
    fits = [epnp(obj, uv_n, w_inl),
            planar_pose(obj, uv_n, w_inl),
            (R_o2[0], t_o2[0], ok_o2),
            (R_o2[1], t_o2[1], ok_o2)]
    R_fits = jnp.stack([f[0] for f in fits])
    t_fits = jnp.stack([f[1] for f in fits])
    ok_fits = jnp.stack([f[2] for f in fits])
    if up is not None:
        ok_fits = ok_fits & _above(R_fits, t_fits)
    # One batched rescoring for all refits; the preference chain stays a
    # scalar where-cascade. A refit must IMPROVE the truncated error to
    # replace the running best.
    s_fits, _ = msac(R_fits, t_fits)
    for i in range(len(fits)):
        use_fit = ok_fits[i] & (s_fits[i] < s_best)
        R_best = jnp.where(use_fit, R_fits[i], R_best)
        t_best = jnp.where(use_fit, t_fits[i], t_best)
        s_best = jnp.where(use_fit, s_fits[i], s_best)

    rvec0 = matrix_to_rodrigues(R_best)
    rvec_gn, tvec_gn = _gn_refine_pose(rvec0, t_best, obj, uv_n, w_inl,
                                       config.refine_iters)
    # Keep the polish only when it improves the truncated error (its
    # per-step monotone guard bounds drift; this bounds the remaining
    # Rodrigues-roundtrip wobble too).
    s_gn, _ = msac(rodrigues_to_matrix(rvec_gn)[None], tvec_gn[None])
    s_pre, _ = msac(R_best[None], t_best[None])
    keep_gn = jnp.all(jnp.isfinite(rvec_gn)) & \
        jnp.all(jnp.isfinite(tvec_gn)) & (s_gn[0] <= s_pre[0])
    if up is not None:
        keep_gn = keep_gn & _above(rodrigues_to_matrix(rvec_gn), tvec_gn)
    rvec = jnp.where(keep_gn, rvec_gn, rvec0)
    tvec = jnp.where(keep_gn, tvec_gn, t_best)
    R_final = rodrigues_to_matrix(rvec)
    err_final = _reproj_err_normalized(R_final, tvec, obj, uv_n)
    inliers = (err_final < thr2) & valid
    num_inl = jnp.sum(inliers.astype(jnp.int32))
    # Reference errors out below 4 points (mod.rs:328-339); we report
    # ok. Beyond the bare >=4 (solvePnPRansac semantics), a CONSENSUS
    # FLOOR: a pose supported by <5% of the valid correspondences is an
    # answer from noise — measured live as a 4-of-166 "consensus" at
    # 72° attitude error that would otherwise report ok (a RANSAC
    # sample-budget miss in the coplanar+noise regime).
    min_consensus = jnp.maximum(
        4, (0.05 * num_valid.astype(jnp.float32)).astype(jnp.int32))
    ok = (num_valid >= 4) & (num_inl >= min_consensus) & \
        jnp.all(jnp.isfinite(rvec)) & jnp.all(jnp.isfinite(tvec))
    if up is not None:
        # Backstop: every selection stage was gated, but if nothing
        # physical survived, refuse rather than return the mirror.
        ok = ok & _above(R_final, tvec)
    # Undo the world-frame normalization: cam ∝ R·obj_orig + t_world.
    tvec = scale * tvec - R_final @ c_obj
    return PoseSolution(rvec=rvec, tvec=tvec, inliers=inliers,
                        num_inliers=num_inl, ok=ok)


def solve_pnp(corr: Correspondences, camera: CameraModel,
              refine_iters: int = 10) -> PoseSolution:
    """Non-robust PnP (all valid points assumed inliers): best of EPnP
    and the planar solver, polished with Gauss-Newton."""
    obj = jnp.asarray(corr.obj_points, jnp.float32)
    pix = jnp.asarray(corr.img_points, jnp.float32)
    uv_n = pixels_to_normalized(pix, camera)
    w = corr.valid.astype(jnp.float32)
    # Same world-frame normalization as solve_pnp_ransac (see there).
    c_obj = jnp.sum(obj * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    centered = (obj - c_obj) * w[:, None]
    scale = jnp.maximum(jnp.sqrt(jnp.sum(centered * centered)
                                 / jnp.maximum(jnp.sum(w), 1.0)), 1e-12)
    obj = (obj - c_obj) / scale
    R, t, ok = epnp(obj, uv_n, w)
    Rp, tp, okp = planar_pose(obj, uv_n, w)
    err_e = jnp.sum(jnp.where(jnp.isfinite(_reproj_err_normalized(R, t, obj, uv_n)),
                              _reproj_err_normalized(R, t, obj, uv_n), 1e12) * w)
    err_p = jnp.sum(jnp.where(jnp.isfinite(_reproj_err_normalized(Rp, tp, obj, uv_n)),
                              _reproj_err_normalized(Rp, tp, obj, uv_n), 1e12) * w)
    use_p = okp & ((~ok) | (err_p < err_e))
    R = jnp.where(use_p, Rp, R)
    t = jnp.where(use_p, tp, t)
    ok = ok | okp
    rvec = matrix_to_rodrigues(R)
    rvec, tvec = _gn_refine_pose(rvec, t, obj, uv_n, w, refine_iters)
    tvec = scale * tvec - rodrigues_to_matrix(rvec) @ c_obj
    num_valid = jnp.sum(corr.valid.astype(jnp.int32))
    return PoseSolution(
        rvec=rvec, tvec=tvec, inliers=corr.valid,
        num_inliers=num_valid,
        ok=ok & (num_valid >= 4) & jnp.all(jnp.isfinite(rvec)),
    )
