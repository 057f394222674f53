"""Round-3c: batched e2e per-frame ms after the batch-aware flat_take
(custom_vmap linearizes the batch axis into the single-dim gather).
Compare against the round-3 pre-fix numbers (exact B=4: 20.9 ms/frame)."""

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

    for mode in ("exact", "fast"):
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

        ms = bench(lambda s: step1(frame, s), iters=100)
        print(f"  {mode} B=1: {ms:.2f} ms/frame", flush=True)

        for B in (2, 4, 8):
            frames = jnp.stack([frame] * B)

            @jax.jit
            def stepB(fs, salt, cfg=cfg, B=B):
                salts = salt + jnp.arange(B, dtype=jnp.float32)

                def one(f, s):
                    r = localize_frame_jit(f + s * jnp.float32(1e-7), db,
                                           camera, cfg, solve_pose=True)
                    return (r.homography.num_inliers + r.num_matches
                            + r.pose.num_inliers).astype(jnp.float32)

                return jnp.sum(jax.vmap(one)(fs, salts))

            ms = bench(lambda s: stepB(frames, s), iters=max(100 // B, 25))
            print(f"  {mode} B={B}: {ms / B:.2f} ms/frame "
                  f"({ms:.2f} ms/dispatch)", flush=True)


if __name__ == "__main__":
    main()
