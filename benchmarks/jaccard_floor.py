"""Noise floor for the inlier-Jaccard agreement metric: exact-vs-exact
with only the RANSAC seed changed (same matches, same scenes).

Measured (CPU, 40 scenes): median 0.997 / p10 0.987 — see PERF.md
round 3 "descriptor_mode=hybrid"; any mode whose Jaccard sits below
this floor diverges by DESCRIPTOR content, not estimator jitter."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import dataclasses

from cubesat_apds_tpu.core.config import (
    AkazeConfig, MatchConfig, PipelineConfig, PnPConfig, RansacConfig)
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
from cubesat_apds_tpu.ops.warp import warp_perspective
from cubesat_apds_tpu.pipelines.localize import DeviceDb, localize_frame_jit

rng = np.random.default_rng(2024)
N = 512
camera = CameraModel.ideal(500.0, 500.0, 256.0, 256.0)

def make_scene():
    img = np.zeros((N, N), np.float32)
    for _ in range(120):
        cy, cx = rng.integers(10, N - 50, 2)
        s = int(rng.integers(8, 40))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.2, 1.0)
    return img

def rand_h():
    ang = rng.uniform(-0.15, 0.15); s = rng.uniform(0.9, 1.1)
    tx, ty = rng.uniform(-20, 20, 2); p = rng.uniform(-2e-5, 2e-5, 2)
    c, si = np.cos(ang)*s, np.sin(ang)*s
    H = np.array([[c,-si,tx],[si,c,ty],[p[0],p[1],1.0]])
    C = np.array([[1,0,-N/2],[0,1,-N/2],[0,0,1.0]])
    return np.linalg.inv(C) @ H @ C

def cfg(seed):
    return PipelineConfig(akaze=AkazeConfig(capacity=2048),
                          match=MatchConfig(ratio=0.75),
                          ransac=RansacConfig(num_hypotheses=256, seed=seed),
                          pnp=PnPConfig(num_hypotheses=64))

cfgs = [cfg(0), cfg(1)]
jac = []
for si in range(40):
    scene = make_scene()
    Ht = rand_h()
    frame = np.asarray(warp_perspective(jnp.asarray(scene),
        jnp.asarray(np.linalg.inv(Ht), jnp.float32), (N, N)))
    frame = frame + rng.normal(0, 0.01, frame.shape).astype(np.float32)
    feats = detect_and_compute(jnp.asarray(scene), cfgs[0].akaze)
    xy = np.asarray(feats.keypoints.xy)
    obj = np.concatenate([xy*0.1, np.zeros((len(xy),1))],1)
    db = DeviceDb(descriptors=feats.descriptors, xy=jnp.asarray(xy),
                  valid=feats.keypoints.valid,
                  obj_points=jnp.asarray(obj.astype(np.float32)),
                  has_world=True)
    ins = []
    for c in cfgs:
        r = localize_frame_jit(jnp.asarray(frame), db, camera, c, solve_pose=False)
        ins.append(np.asarray(r.homography.inliers))
    a, b = ins
    u = (a|b).sum()
    jac.append(float((a&b).sum()/u) if u else 1.0)
print(f"exact-vs-exact (seed 0 vs 1): median {np.median(jac):.3f} p10 {np.percentile(jac,10):.3f}")
