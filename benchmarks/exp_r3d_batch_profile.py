"""Round-3d: stage profile of the vmapped (B=4) exact pipeline to find
which stage still inflates per-frame cost under batching."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.exp_r3_gather import _make_frame, bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig
    from cubesat_apds_tpu.ops.features.akaze import (
        _packed_stack, detect_and_compute)
    from cubesat_apds_tpu.ops.features.detect import detect_keypoints
    from cubesat_apds_tpu.ops.features.mldb import mldb_descriptors
    from cubesat_apds_tpu.ops.features.orientation import compute_orientations
    from cubesat_apds_tpu.ops.features.scale_space import build_scale_space
    from cubesat_apds_tpu.ops.match import knn_match

    rng = np.random.default_rng(42)
    frame = jnp.asarray(_make_frame(rng))
    cfg = PipelineConfig(akaze=AkazeConfig(capacity=2048,
                                           descriptor_mode="exact"))
    B = 4
    frames = jnp.stack([frame] * B)

    db_src = np.roll(np.asarray(frame), (7, 13), axis=(0, 1))
    feats = detect_and_compute(jnp.asarray(db_src), AkazeConfig(capacity=2048))
    desc = np.asarray(feats.descriptors)
    m = 10240
    reps = m // len(desc) + 1
    desc_db = jnp.asarray(np.tile(desc, (reps, 1))[:m])
    valid_db = jnp.asarray(np.tile(np.asarray(feats.keypoints.valid),
                                   reps)[:m])

    def upto(stage):
        def one(fr, salt):
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
            mt = knn_match(desc, desc_db, ratio=0.75,
                           q_valid=kps.valid, db_valid=valid_db)
            return mt.count().astype(jnp.float32)

        @jax.jit
        def f(fs, salt):
            salts = salt + jnp.arange(B, dtype=jnp.float32)
            return jnp.sum(jax.vmap(one)(fs, salts))
        return f

    prev = 0.0
    for stage in ("ss", "detect", "orient", "mldb", "match"):
        f = upto(stage)
        ms = bench(lambda s, f=f: f(frames, s), iters=40)
        print(f"  B={B} through {stage:7s}: {ms:7.2f} ms/dispatch "
              f"({ms / B:.2f}/frame, +{(ms - prev) / B:.2f}/frame)",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
