"""Bit disagreement vs exact for the fast and hybrid MLDB modes
(CPU-runnable; the fidelity side is platform-independent). See PERF.md
round 3 "descriptor_mode=hybrid" for measured numbers."""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.ops.features import akaze as A
from cubesat_apds_tpu.ops.match import unpack_bits

def make_scene(rng, n=512):
    img = np.zeros((n, n), np.float32)
    for _ in range(180):
        cy, cx = rng.integers(8, n - 48, 2)
        s = int(rng.integers(6, 44))
        img[cy:cy+s, cx:cx+s] += rng.uniform(-0.5, 0.8)
    img += rng.normal(0, 0.01, img.shape)
    return np.clip(img - img.min(), 0, None) / max(1e-6, np.ptp(img))

cfgs = {m: AkazeConfig(capacity=2048, descriptor_mode=m)
        for m in ("exact", "fast", "hybrid")}
rng = np.random.default_rng(7)
stats = {m: [] for m in ("fast", "hybrid")}
for i in range(6):
    img = jnp.asarray(make_scene(rng))
    fe = A.detect_and_compute(img, cfgs["exact"])
    v = np.asarray(fe.keypoints.valid)
    be = np.asarray(unpack_bits(fe.descriptors))[v][:, :486].astype(bool)
    for m in ("fast", "hybrid"):
        fm = A.detect_and_compute(img, cfgs[m])
        bm = np.asarray(unpack_bits(fm.descriptors))[v][:, :486].astype(bool)
        d = (be ^ bm).sum(1)
        stats[m].append(d)
    print(f"scene {i}: K={v.sum()} fast={stats['fast'][-1].mean():.1f} "
          f"hybrid={stats['hybrid'][-1].mean():.1f} bitflips/486")
for m in ("fast", "hybrid"):
    d = np.concatenate(stats[m])
    print(f"{m}: mean {d.mean():.1f} p90 {np.percentile(d,90):.0f} max {d.max()}")
