"""Round-3i: decompose solve_pnp_ransac (the +1.23 ms e2e stage) into
hypotheses / scoring / refits / GN-polish to find the latency chain.
Hardened protocol."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.exp_r3_gather import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import PnPConfig
    from cubesat_apds_tpu.core.types import CameraModel, Correspondences
    from cubesat_apds_tpu.ops.geometry import pnp as pnp_mod
    from cubesat_apds_tpu.ops.geometry.epnp import epnp
    from cubesat_apds_tpu.ops.geometry.planar import ortho_pose, planar_pose
    from cubesat_apds_tpu.ops.geometry.rodrigues import matrix_to_rodrigues

    rng = np.random.default_rng(7)
    n = 2048
    # Synthetic near-nadir scene: points on a gently undulating ground
    # plane, camera at altitude looking down.
    xy = rng.uniform(-500, 500, (n, 2)).astype(np.float32)
    z = (20 * np.sin(xy[:, 0] / 97) * np.cos(xy[:, 1] / 71)).astype(np.float32)
    obj = np.concatenate([xy, z[:, None]], axis=1)
    Rt = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    t = np.array([0, 0, 3000], np.float32)
    cam = obj @ Rt.T + t
    uv = cam[:, :2] / cam[:, 2:3]
    K = np.array([[500, 0, 256], [0, 500, 256], [0, 0, 1]], np.float32)
    pix = uv * 500 + 256
    pix += rng.normal(0, 0.5, pix.shape).astype(np.float32)
    valid = rng.random(n) < 0.55
    pix[~valid] += rng.uniform(-200, 200, (int((~valid).sum()), 2))

    camera = CameraModel.ideal(500.0, 500.0, 256.0, 256.0)
    corr = Correspondences(
        obj_points=jnp.asarray(obj), img_points=jnp.asarray(pix),
        valid=jnp.asarray(valid))
    cfg = PnPConfig(num_hypotheses=64)

    from cubesat_apds_tpu.core.camera import pixels_to_normalized

    def upto(stage):
        @jax.jit
        def f(pix_in, salt):
            pix_s = pix_in + salt * jnp.float32(1e-7)
            objx = jnp.asarray(obj)
            validx = jnp.asarray(valid)
            uv_n = pixels_to_normalized(pix_s, camera)
            vf = validx.astype(jnp.float32)
            num_valid = jnp.sum(validx.astype(jnp.int32))
            c_obj = (jnp.sum(objx * vf[:, None], axis=0)
                     / jnp.maximum(jnp.sum(vf), 1.0))
            centered = (objx - c_obj) * vf[:, None]
            scale = jnp.maximum(jnp.sqrt(
                jnp.sum(centered * centered)
                / jnp.maximum(jnp.sum(vf), 1.0)), 1e-12)
            objn = (objx - c_obj) / scale
            thr2 = (cfg.reproj_threshold / 500.0) ** 2
            key = jax.random.PRNGKey(0)
            valid_first = jnp.argsort(~validx).astype(jnp.int32)
            r = jax.random.randint(
                key, (cfg.num_hypotheses, cfg.sample_size), 0,
                jnp.maximum(num_valid, 1))
            samp = valid_first[r]

            def solve_one(idx):
                R, tt, ok = epnp(objn[idx], uv_n[idx], fast=True)
                Rp, tp, okp = planar_pose(objn[idx], uv_n[idx])
                return (jnp.stack([R, Rp]), jnp.stack([tt, tp]),
                        jnp.stack([ok, okp]))

            Rs, ts, oks = jax.vmap(solve_one)(samp)
            Rs = Rs.reshape(-1, 3, 3)
            ts = ts.reshape(-1, 3)
            oks = oks.reshape(-1)
            if stage == "hyp":
                return jnp.sum(Rs) + jnp.sum(ts)
            R_o, t_o, ok_o = ortho_pose(objn, uv_n, vf)
            Rs = jnp.concatenate([Rs, R_o[None]], axis=0)
            ts = jnp.concatenate([ts, t_o[None]], axis=0)
            oks = jnp.concatenate([oks, ok_o[None]], axis=0)
            err = pnp_mod._reproj_err_normalized(Rs, ts, objn, uv_n)
            inl = (err < thr2) & validx[None, :]
            scores = jnp.where(oks, jnp.sum(inl, axis=-1), -1)
            best = jnp.argmax(scores)
            R_best, t_best = Rs[best], ts[best]
            inliers = inl[best]
            if stage == "score":
                return jnp.sum(R_best) + jnp.sum(t_best)
            w_inl = inliers.astype(jnp.float32)
            n_best = jnp.sum(inliers)
            for refit in (lambda: epnp(objn, uv_n, w_inl),
                          lambda: planar_pose(objn, uv_n, w_inl),
                          lambda: ortho_pose(objn, uv_n, w_inl)):
                R_fit, t_fit, fit_ok = refit()
                n_fit = jnp.sum((pnp_mod._reproj_err_normalized(
                    R_fit, t_fit, objn, uv_n) < thr2) & validx)
                use_fit = fit_ok & (n_fit >= n_best)
                R_best = jnp.where(use_fit, R_fit, R_best)
                t_best = jnp.where(use_fit, t_fit, t_best)
                n_best = jnp.where(use_fit, n_fit, n_best)
            if stage == "refit":
                return jnp.sum(R_best) + jnp.sum(t_best)
            rvec0 = matrix_to_rodrigues(R_best)
            rvec_gn, tvec_gn = pnp_mod._gn_refine_pose(
                rvec0, t_best, objn, uv_n, w_inl, cfg.refine_iters)
            return jnp.sum(rvec_gn) + jnp.sum(tvec_gn)
        return f

    pj = jnp.asarray(pix)
    prev = 0.0
    for stage in ("hyp", "score", "refit", "gn"):
        f = upto(stage)
        ms = bench(lambda s, f=f: f(pj, s), iters=150)
        print(f"  through {stage:6s}: {ms:7.3f} ms  (+{ms - prev:.3f})",
              flush=True)
        prev = ms

    from cubesat_apds_tpu.ops.geometry.pnp import solve_pnp_ransac

    @jax.jit
    def full(pix_in, salt):
        c = Correspondences(obj_points=corr.obj_points,
                            img_points=pix_in + salt * jnp.float32(1e-7),
                            valid=corr.valid)
        p = solve_pnp_ransac(c, camera, cfg)
        return p.num_inliers.astype(jnp.float32) + jnp.sum(p.rvec)

    ms = bench(lambda s: full(pj, s), iters=150)
    print(f"  full solve_pnp_ransac: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
