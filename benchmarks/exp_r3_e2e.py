"""Round-3 check: e2e per-frame ms per descriptor mode (exact/fast/
hybrid) after the flat-gather sampler change (hardened protocol).
Usage: python benchmarks/exp_r3_e2e.py [mode1,mode2,...]"""

from __future__ import annotations

import os
import sys
import time

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
    from cubesat_apds_tpu.pipelines.localize import (
        DeviceDb, localize_frame_jit)

    rng = np.random.default_rng(42)
    frame = jnp.asarray(_make_frame(rng))
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

    modes = tuple(sys.argv[1].split(",")) if len(sys.argv) > 1 else (
        "exact", "fast", "hybrid")
    for mode in modes:
        cfg = PipelineConfig(
            akaze=AkazeConfig(capacity=2048, descriptor_mode=mode),
            match=MatchConfig(ratio=0.75),
            ransac=RansacConfig(num_hypotheses=256),
            pnp=PnPConfig(num_hypotheses=64),
        )

        @jax.jit
        def step1(f, salt, cfg=cfg):
            r = localize_frame_jit(f + salt * jnp.float32(1e-7), db, camera,
                                   cfg, solve_pose=True)
            return (r.homography.num_inliers + r.num_matches
                    + r.pose.num_inliers).astype(jnp.float32)

        ms = bench(lambda s: step1(frame, s), iters=150)
        print(f"{mode} B=1: {ms:.2f} ms/frame = {1000.0 / ms:.1f} fps",
              flush=True)


if __name__ == "__main__":
    main()
