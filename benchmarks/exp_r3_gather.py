"""Round-3 experiments: batch scaling + gather formulations (real TPU).

Hardened protocol (PERF.md "Measurement integrity"): per-iteration input
salt + chained scalar accumulator fetched once, fetch RTT subtracted.

Experiments:
  E1  e2e localize per-frame ms at B=1,2,4,8 for exact and fast modes
  E2  big-slice window gather: [K] indices, slice (1,R,128,4) bf16
  E3  point gather 3D vs flattened-1D linearized indices (550·K points)
  E4  stage profile (exact): scale-space / detect / orient / mldb / match+geom
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_frame(rng, n=512):
    img = np.zeros((n, n), np.float32)
    for _ in range(120):
        cy, cx = rng.integers(10, n - 50, 2)
        s = int(rng.integers(8, 40))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.2, 1.0)
    return img


def bench(fn, iters=50, warmup=2):
    """fn(salt) -> scalar array; returns ms/iter (chained, RTT-subtracted)."""
    import jax.numpy as jnp
    entropy = np.float32(time.time() % 1000.0)
    acc = None
    for i in range(warmup):
        o = fn(jnp.float32(entropy + 50_000.0 + i))
        acc = o if acc is None else acc + o
    float(acc)
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jnp.asarray(np.float32(i)) + jnp.float32(1))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    t0 = time.perf_counter()
    acc = None
    for i in range(iters):
        o = fn(jnp.float32(entropy + i))
        acc = o if acc is None else acc + o
    float(acc)
    dt = time.perf_counter() - t0 - rtt
    return dt / iters * 1e3


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

    def make_cfg(mode):
        return PipelineConfig(
            akaze=AkazeConfig(capacity=2048, descriptor_mode=mode),
            match=MatchConfig(ratio=0.75),
            ransac=RansacConfig(num_hypotheses=256),
            pnp=PnPConfig(num_hypotheses=64),
        )

    # Shared DB (same recipe as bench.py).
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

    print("== E1: e2e per-frame ms vs batch ==", flush=True)
    for mode in ("exact", "fast"):
        cfg = make_cfg(mode)

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

    print("== E2/E3: gather formulations ==", flush=True)
    # Stand-in packed stack [16, 512, 512, 4] bf16 and 2048 keypoints.
    L, H, W, C = 16, 512, 512, 4
    K = 2048
    stack = jnp.asarray(rng.standard_normal((L, H, W, C)), jnp.bfloat16)
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    cy = jnp.asarray(rng.integers(0, H, K), jnp.int32)
    cx = jnp.asarray(rng.integers(0, W, K), jnp.int32)
    S = 550
    offy = jnp.asarray(rng.integers(-43, 44, (K, S)), jnp.int32)
    offx = jnp.asarray(rng.integers(-43, 44, (K, S)), jnp.int32)

    @jax.jit
    def g3d(salt):
        iy = jnp.clip(cy[:, None] + offy + salt.astype(jnp.int32) % 2,
                      0, H - 1)
        ix = jnp.clip(cx[:, None] + offx, 0, W - 1)
        lv = jnp.broadcast_to(lvl[:, None], iy.shape)
        vals = stack[lv, iy, ix]                      # [K, S, C]
        return jnp.sum(vals.astype(jnp.float32))

    print(f"  point gather 3D   [K*{S}]: {bench(g3d, iters=30):.2f} ms",
          flush=True)

    flat = stack.reshape(L * H * W, C)

    @jax.jit
    def g1d(salt):
        iy = jnp.clip(cy[:, None] + offy + salt.astype(jnp.int32) % 2,
                      0, H - 1)
        ix = jnp.clip(cx[:, None] + offx, 0, W - 1)
        lin = (lvl[:, None] * H + iy) * W + ix
        vals = flat[lin]                              # [K, S, C]
        return jnp.sum(vals.astype(jnp.float32))

    print(f"  point gather flat [K*{S}]: {bench(g1d, iters=30):.2f} ms",
          flush=True)

    for R in (64, 96):
        @jax.jit
        def gwin(salt, R=R):
            ry0 = jnp.clip(cy - R // 2 + salt.astype(jnp.int32) % 2,
                           0, H - R)
            rx0 = jnp.clip(cx - 64, 0, W - 128)
            starts = jnp.stack(
                [lvl, ry0, rx0, jnp.zeros_like(lvl)], axis=-1)
            vals = jax.lax.gather(
                stack, starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0, 1, 2, 3)),
                slice_sizes=(1, R, 128, C),
                mode="clip")                          # [K, R, 128, C]
            return jnp.sum(vals.astype(jnp.float32) ** 2) * 0 + \
                jnp.sum(vals[:, ::8, ::8].astype(jnp.float32))

        print(f"  window gather [K] slices (1,{R},128,{C}): "
              f"{bench(gwin, iters=30):.2f} ms", flush=True)

    # E2b: row-segment gather: R rows of 128 lanes per kp via [K*R] indices.
    for R in (64,):
        @jax.jit
        def grows(salt, R=R):
            ry = jnp.clip(cy[:, None] + jnp.arange(R)[None, :] - R // 2
                          + salt.astype(jnp.int32) % 2, 0, H - 1)
            rx0 = jnp.clip(cx - 64, 0, W - 128)
            starts = jnp.stack([
                jnp.broadcast_to(lvl[:, None], ry.shape),
                ry,
                jnp.broadcast_to(rx0[:, None], ry.shape),
                jnp.zeros_like(ry)], axis=-1).reshape(K * R, 4)
            vals = jax.lax.gather(
                stack, starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2),
                    collapsed_slice_dims=(0, 1),
                    start_index_map=(0, 1, 2, 3)),
                slice_sizes=(1, 1, 128, C),
                mode="clip")                          # [K*R, 128, C]
            return jnp.sum(vals[:, ::8].astype(jnp.float32))

        print(f"  row gather [K*{R}] slices (1,1,128,{C}): "
              f"{bench(grows, iters=30):.2f} ms", flush=True)

    print("== E4: exact stage profile ==", flush=True)
    from cubesat_apds_tpu.ops.features.detect import detect_keypoints
    from cubesat_apds_tpu.ops.features.scale_space import build_scale_space
    from cubesat_apds_tpu.ops.features.akaze import _packed_stack
    from cubesat_apds_tpu.ops.features.orientation import compute_orientations
    from cubesat_apds_tpu.ops.features.mldb import mldb_descriptors
    from cubesat_apds_tpu.ops.match import knn_match
    cfg = make_cfg("exact")

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
        ms = bench(lambda s, f=f: f(frame, s), iters=60)
        print(f"  through {stage:7s}: {ms:7.2f} ms  (+{ms - prev:.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
