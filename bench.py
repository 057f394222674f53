"""Headline benchmark: end-to-end frames/sec/chip (detect → match → pose).

BASELINE.json config 1 workload: 512×512 grayscale frame, AKAZE
detect+describe, kNN ratio match against a 10k-descriptor DB, RANSAC
homography + PnP pose — the full online localization step, one jit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the 100 fps/chip north-star target
(BASELINE.md: the reference publishes no numbers of its own).

Measurement methodology (tunneled-TPU hardened, round 2):
  * every iteration perturbs the frame with a distinct on-device scalar
    (unique per process via time entropy), so no layer — XLA, the axon
    relay's content-addressed result cache, anything — can ever replay
    a previous result instead of executing;
  * jax.block_until_ready is NOT trusted as a fence (it is a no-op for
    the axon remote backend): a scalar from every iteration's output is
    chained into one accumulator whose final host fetch FORCES all
    iterations to have executed;
  * the single fetch's round-trip latency (~200 ms through the tunnel)
    is measured separately (median of scalar fetches) and subtracted.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

_T0 = time.time()


def _note(msg):
    """Phase progress to STDERR (stdout carries only the JSON line) —
    through a slow relay the compile phases can take minutes; a silent
    process is indistinguishable from a hung tunnel without these."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _make_frame(rng, n=512):
    """Corner-rich synthetic satellite frame (texture at AKAZE scales)."""
    img = np.zeros((n, n), np.float32)
    for _ in range(120):
        cy, cx = rng.integers(10, n - 50, 2)
        s = int(rng.integers(8, 40))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.2, 1.0)
    return img


def main():
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.cli import _enable_compile_cache

    # Same persistent-executable cache the CLI uses (~/.cache/apds_tpu/
    # xla): a bench retry — or the driver's round-end run after this
    # one — skips the 20-80 s-per-program remote compiles. No-op when
    # a caller forced CPU (the axon-site serializer crash, cli.py).
    _enable_compile_cache()

    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, PnPConfig, RansacConfig)
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
    from cubesat_apds_tpu.pipelines.localize import DeviceDb, localize_frame_jit

    _note(f"imports done; devices={jax.devices()}")
    rng = np.random.default_rng(42)
    config = PipelineConfig(
        akaze=AkazeConfig(capacity=2048),
        match=MatchConfig(ratio=0.75),
        ransac=RansacConfig(num_hypotheses=256),
        pnp=PnPConfig(num_hypotheses=64),
    )

    frame = jnp.asarray(_make_frame(rng))

    # Build a realistic 10k-descriptor DB: extract from a shifted variant
    # so matching does real work, pad to 10240.
    db_src = np.roll(np.asarray(frame), (7, 13), axis=(0, 1))
    _note("compiling+running detect_and_compute for the DB build")
    feats = detect_and_compute(jnp.asarray(db_src),
                               AkazeConfig(capacity=2048))
    desc = np.asarray(feats.descriptors)
    xy = np.asarray(feats.keypoints.xy)
    valid = np.asarray(feats.keypoints.valid)
    m = 10240
    reps = m // len(desc) + 1
    desc_db = np.tile(desc, (reps, 1))[:m]
    xy_db = np.tile(xy, (reps, 1))[:m]
    valid_db = np.tile(valid, reps)[:m]
    # Perturb the tiled copies so top-2 isn't degenerate.
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

    @jax.jit
    def step(f, salt):
        # The ±1e-7 per-iteration salt keeps every execution's inputs
        # unique (cache-busting) without affecting the workload.
        r = localize_frame_jit(f + salt * jnp.float32(1e-7), db, camera,
                               config, solve_pose=True)
        return (r.homography.num_inliers + r.num_matches
                + r.pose.num_inliers).astype(jnp.float32)

    entropy = np.float32(time.time() % 1000.0)

    def run(iters, base):
        acc = None
        for i in range(iters):
            o = step(frame, jnp.float32(base + i))
            acc = o if acc is None else acc + o
        return float(acc)          # forces every iteration

    _note("compiling localize_frame_jit (warmup x3)")
    run(3, entropy + 10_000.0)     # compile + warmup
    _note("warmup done; measuring RTT")

    # Median host-fetch round trip (subtracted from the loop time).
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(jnp.asarray(np.float32(i)) + jnp.float32(1))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    # N repeats → median ± spread, so run-to-run tunnel noise is visible
    # in the artifact itself (VERDICT r4 next #7: the r3→r4 "185.6 vs
    # 180.0" question should be answerable from the JSON, not judgment).
    n_reps = 5
    iters = 80
    _note(f"timed: {n_reps} reps x {iters} iters (rtt={rtt * 1e3:.0f} ms)")
    fps_reps = []
    for rep in range(n_reps):
        t0 = time.perf_counter()
        run(iters, entropy + rep * iters)
        dt = time.perf_counter() - t0 - rtt
        fps_reps.append(iters / dt)
        _note(f"rep {rep}: {fps_reps[-1]:.1f} fps")
    fps = float(np.median(fps_reps))
    spread = float(np.max(fps_reps) - np.min(fps_reps))

    print(json.dumps({
        "metric": "e2e_localize_512px_10kdb_fps",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 100.0, 3),
        "spread": round(spread, 2),
        "reps": [round(f, 2) for f in fps_reps],
    }))


if __name__ == "__main__":
    main()
