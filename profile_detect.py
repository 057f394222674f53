import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.ops.features.scale_space import build_scale_space
from cubesat_apds_tpu.ops.features.detect import detect_keypoints
from cubesat_apds_tpu.ops.features.orientation import compute_orientations
from cubesat_apds_tpu.ops.features.mldb import mldb_descriptors
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute, _pad_stack

rng = np.random.default_rng(42)
img = np.zeros((512,512), np.float32)
for _ in range(120):
    cy, cx = rng.integers(10, 462, 2); s = int(rng.integers(8,40))
    img[cy:cy+s, cx:cx+s] = rng.uniform(0.2,1.0)
frame = jnp.asarray(img)
cfg = AkazeConfig(capacity=2048)

def bench(name, fn, *args, n=10):
    out = fn(*args)
    out = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.tree_util.tree_leaves(fn(*args))
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

@jax.jit
def ss_only(f):
    ss = build_scale_space(f, cfg)
    return ss.Lt, ss.Lsmooth
bench("scale_space", ss_only, frame)

@jax.jit
def det(f):
    ss = build_scale_space(f, cfg)
    kps, lx, ly = detect_keypoints(ss, cfg, 2048)
    return kps
bench("ss+detect", det, frame)

@jax.jit
def det_orient(f):
    ss = build_scale_space(f, cfg)
    kps, lx, ly = detect_keypoints(ss, cfg, 2048)
    lxs, lys = _pad_stack(lx), _pad_stack(ly)
    hw = jnp.asarray([[a.shape[0], a.shape[1]] for a in ss.Lt], jnp.int32)
    ang = compute_orientations(lxs, lys, hw, kps.xy, kps.size, kps.class_id, kps.octave, kps.valid)
    return ang
bench("ss+detect+orient", det_orient, frame)

@jax.jit
def full(f):
    return detect_and_compute(f, cfg)
bench("full (orient+mldb)", full, frame)
