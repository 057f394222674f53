"""Round-3j: decompose the 3.7 ms features stage (exact mode, adaptive
ladder default) at three cut points — scale space / +detect /
+orient+mldb (= full detect_and_compute) — to locate the next win.
Hardened protocol (salted inputs, chained forced fetch)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.exp_r3_gather import _make_frame, bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import AkazeConfig
    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
    from cubesat_apds_tpu.ops.features.detect import detect_keypoints
    from cubesat_apds_tpu.ops.features.scale_space import build_scale_space

    rng = np.random.default_rng(42)
    frame = jnp.asarray(_make_frame(rng))
    cfg = AkazeConfig(capacity=2048, descriptor_mode="exact")

    @jax.jit
    def f_ss(fr, salt):
        ss = build_scale_space(fr + salt * jnp.float32(1e-7), cfg)
        return sum(jnp.sum(a) for a in ss.Lt).astype(jnp.float32)

    @jax.jit
    def f_detect(fr, salt):
        ss = build_scale_space(fr + salt * jnp.float32(1e-7), cfg)
        kps, lx, ly = detect_keypoints(ss, cfg, cfg.capacity)
        return (jnp.sum(kps.response) + sum(jnp.sum(a) for a in lx)
                + sum(jnp.sum(a) for a in ly)).astype(jnp.float32)

    @jax.jit
    def f_full(fr, salt):
        feats = detect_and_compute(fr + salt * jnp.float32(1e-7), cfg)
        return (jnp.sum(feats.descriptors.astype(jnp.int32))
                + feats.keypoints.count()).astype(jnp.float32)

    prev = 0.0
    for name, f in (("scale space", f_ss), ("+detect", f_detect),
                    ("+orient+mldb", f_full)):
        ms = bench(lambda s, f=f: f(frame, s), iters=150)
        print(f"  {name:14s}: {ms:7.2f} ms  (+{ms - prev:.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
