"""Round-3h: decompose the LADDER-path e2e (the shipping pipeline) at
four cut points — features / +match / +homography / +pose — to locate
the remaining non-feature cost. Hardened protocol (salted inputs,
chained forced fetch)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.exp_r3_gather import _make_frame, bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, PnPConfig, RansacConfig)
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
    from cubesat_apds_tpu.ops.geometry.homography import (
        find_homography_ransac)
    from cubesat_apds_tpu.ops.match import knn_match, matched_points
    from cubesat_apds_tpu.pipelines.localize import (
        DeviceDb, localize_frame_jit, solve_pose_recentered)

    rng = np.random.default_rng(42)
    frame = jnp.asarray(_make_frame(rng))
    cfg = PipelineConfig(
        akaze=AkazeConfig(capacity=2048, descriptor_mode="exact"),
        match=MatchConfig(ratio=0.75),
        ransac=RansacConfig(num_hypotheses=256),
        pnp=PnPConfig(num_hypotheses=64),
    )

    db_src = np.roll(np.asarray(frame), (7, 13), axis=(0, 1))
    feats = detect_and_compute(jnp.asarray(db_src), AkazeConfig(capacity=2048))
    desc = np.asarray(feats.descriptors)
    xy = np.asarray(feats.keypoints.xy)
    valid = np.asarray(feats.keypoints.valid)
    m = 10240
    reps = m // len(desc) + 1
    desc_db = np.tile(desc, (reps, 1))[:m]
    xy_db = np.tile(xy, (reps, 1))[:m]
    valid_db = np.tile(valid, reps)[:m]
    flip = rng.integers(0, 256, desc_db.shape, dtype=np.uint8)
    flip[:len(desc)] = 0
    desc_db = desc_db ^ (flip & rng.integers(0, 2, desc_db.shape,
                                             dtype=np.uint8) * 255)
    obj = np.concatenate([xy_db, np.zeros((m, 1), np.float32)], axis=1)
    db = DeviceDb(
        descriptors=jnp.asarray(desc_db),
        xy=jnp.asarray(xy_db.astype(np.float32)),
        valid=jnp.asarray(valid_db),
        obj_points=jnp.asarray(obj.astype(np.float32)),
        has_world=True,
    )
    camera = CameraModel.ideal(500.0, 500.0, 256.0, 256.0)

    def upto(stage):
        @jax.jit
        def f(fr, salt):
            img = fr + salt * jnp.float32(1e-7)
            feats = detect_and_compute(img, cfg.akaze)
            kp = feats.keypoints
            if stage == "features":
                return (jnp.sum(feats.descriptors.astype(jnp.int32))
                        + kp.count()).astype(jnp.float32)
            matches = knn_match(
                feats.descriptors, db.descriptors, ratio=cfg.match.ratio,
                q_valid=kp.valid, db_valid=db.valid,
                block=cfg.match.db_block)
            if stage == "match":
                return matches.count().astype(jnp.float32)
            q_pts, t_pts = matched_points(kp.xy, db.xy, matches)
            homog = find_homography_ransac(q_pts, t_pts,
                                           valid=matches.valid,
                                           config=cfg.ransac)
            if stage == "homog":
                return homog.num_inliers.astype(jnp.float32)
            pose = solve_pose_recentered(db.obj_points, q_pts, matches,
                                         camera, cfg.pnp)
            return (homog.num_inliers + pose.num_inliers).astype(
                jnp.float32)
        return f

    prev = 0.0
    for stage in ("features", "match", "homog", "pose"):
        f = upto(stage)
        ms = bench(lambda s, f=f: f(frame, s), iters=120)
        print(f"  through {stage:8s}: {ms:7.2f} ms  (+{ms - prev:.2f})",
              flush=True)
        prev = ms

    @jax.jit
    def e2e(f, salt):
        r = localize_frame_jit(f + salt * jnp.float32(1e-7), db, camera,
                               cfg, solve_pose=True)
        return (r.homography.num_inliers + r.num_matches
                + r.pose.num_inliers).astype(jnp.float32)

    ms = bench(lambda s: e2e(frame, s), iters=150)
    print(f"  e2e exact: {ms:.2f} ms/frame = {1000.0 / ms:.1f} fps",
          flush=True)


if __name__ == "__main__":
    main()
