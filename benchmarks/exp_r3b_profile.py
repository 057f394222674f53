"""Round-3b: stage profile of the CURRENT exact pipeline (post flat
gather) to target the next optimization. Hardened protocol."""

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
    from cubesat_apds_tpu.ops.features.akaze import (
        _packed_stack, detect_and_compute)
    from cubesat_apds_tpu.ops.features.detect import detect_keypoints
    from cubesat_apds_tpu.ops.features.mldb import mldb_descriptors
    from cubesat_apds_tpu.ops.features.orientation import compute_orientations
    from cubesat_apds_tpu.ops.features.scale_space import build_scale_space
    from cubesat_apds_tpu.ops.match import knn_match
    from cubesat_apds_tpu.pipelines.localize import (
        DeviceDb, localize_frame_jit)

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
            ss = build_scale_space(img, cfg.akaze)
            if stage == "ss":
                return sum(jnp.sum(x) for x in ss.Lt)
            kps, lxs, lys = detect_keypoints(ss, cfg.akaze, 2048)
            if stage == "detect":
                return jnp.sum(kps.response)
            packed = _packed_stack(ss.Lt, lxs, lys)
            level_hw = jnp.asarray(
                [[a.shape[0], a.shape[1]] for a in ss.Lt], jnp.int32)
            ang = compute_orientations(
                packed, level_hw, kps.xy, kps.size, kps.class_id,
                kps.octave, kps.valid)
            if stage == "orient":
                return jnp.sum(ang)
            desc = mldb_descriptors(packed, level_hw, kps.xy, kps.size,
                                    ang, kps.class_id, kps.octave, kps.valid)
            if stage == "mldb":
                return jnp.sum(desc.astype(jnp.int32)).astype(jnp.float32)
            mt = knn_match(desc, db.descriptors, ratio=0.75,
                           q_valid=kps.valid, db_valid=db.valid)
            return mt.count().astype(jnp.float32)
        return f

    prev = 0.0
    for stage in ("ss", "detect", "orient", "mldb", "match"):
        f = upto(stage)
        ms = bench(lambda s, f=f: f(frame, s), iters=80)
        print(f"  through {stage:7s}: {ms:7.2f} ms  (+{ms - prev:.2f})",
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
