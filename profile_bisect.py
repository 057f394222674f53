import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig, MatchConfig, RansacConfig, PnPConfig
from cubesat_apds_tpu.ops.features.scale_space import build_scale_space
from cubesat_apds_tpu.ops.features.detect import detect_keypoints, det_hessian_response, _maxpool3x3
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
from cubesat_apds_tpu.ops.match import knn_match, matched_points
from cubesat_apds_tpu.ops.geometry.homography import dlt_homography, find_homography_ransac, symmetric_transfer_error

rng = np.random.default_rng(42)
img = np.zeros((512,512), np.float32)
for _ in range(120):
    cy, cx = rng.integers(10, 462, 2); s = int(rng.integers(8,40))
    img[cy:cy+s, cx:cx+s] = rng.uniform(0.2,1.0)
frame = jax.device_put(jnp.asarray(img))
cfg = AkazeConfig(capacity=2048)
m = 10240
db_desc = jax.device_put(jnp.asarray(rng.integers(0,256,(m,61),dtype=np.uint8)))
db_xy = jax.device_put(jnp.asarray(rng.uniform(0,512,(m,2)).astype(np.float32)))
db_valid = jax.device_put(jnp.ones(m,bool))

def bench(name, fn, *args):
    out = fn(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out))
        ts.append((time.perf_counter()-t0)*1000)
    print(f"{name:32s} {min(ts):8.2f} ms", flush=True)

@jax.jit
def v0(f):
    ss = build_scale_space(f, cfg)
    return sum(jnp.sum(x) for x in ss.Lt)
bench("v0 scale_space", v0, frame)

@jax.jit
def v0b(f):
    ss = build_scale_space(f, cfg)
    acc = 0.
    for i in range(16):
        ldet, lx, ly = det_hessian_response(ss.Lsmooth[i], ss.meta[i].sigma_size)
        acc += jnp.sum(ldet) + jnp.sum(lx)
    return acc
bench("v0b +derivatives", v0b, frame)

@jax.jit
def v1(f):
    ss = build_scale_space(f, cfg)
    kps, lx, ly = detect_keypoints(ss, cfg, 2048)
    return jnp.sum(kps.response), jnp.sum(kps.valid)
bench("v1 +detect(topk)", v1, frame)

@jax.jit
def v2(f):
    feats = detect_and_compute(f, cfg)
    return jnp.sum(feats.descriptors.astype(jnp.int32)), feats.keypoints.count()
bench("v2 +orient+mldb", v2, frame)

@jax.jit
def v3(f, db, dbxy, dbv):
    feats = detect_and_compute(f, cfg)
    mm = knn_match(feats.descriptors, db, ratio=0.75, q_valid=feats.keypoints.valid, db_valid=dbv)
    return mm.count()
bench("v3 +match", v3, frame, db_desc, db_xy, db_valid)

@jax.jit
def v4(f, db, dbxy, dbv):
    feats = detect_and_compute(f, cfg)
    mm = knn_match(feats.descriptors, db, ratio=0.75, q_valid=feats.keypoints.valid, db_valid=dbv)
    q, t = matched_points(feats.keypoints.xy, dbxy, mm)
    key = jax.random.PRNGKey(0)
    gum = jax.random.gumbel(key, (256, q.shape[0]))
    gum = jnp.where(mm.valid[None,:], gum, -jnp.inf)
    _, sample = jax.lax.top_k(gum, 4)
    return jnp.sum(sample)
bench("v4 +gumbel_sample", v4, frame, db_desc, db_xy, db_valid)

@jax.jit
def v5(f, db, dbxy, dbv):
    feats = detect_and_compute(f, cfg)
    mm = knn_match(feats.descriptors, db, ratio=0.75, q_valid=feats.keypoints.valid, db_valid=dbv)
    q, t = matched_points(feats.keypoints.xy, dbxy, mm)
    key = jax.random.PRNGKey(0)
    gum = jax.random.gumbel(key, (256, q.shape[0]))
    gum = jnp.where(mm.valid[None,:], gum, -jnp.inf)
    _, sample = jax.lax.top_k(gum, 4)
    Hs = dlt_homography(q[sample], t[sample])
    return jnp.sum(Hs)
bench("v5 +batched_dlt(eigh)", v5, frame, db_desc, db_xy, db_valid)

@jax.jit
def v6(f, db, dbxy, dbv):
    feats = detect_and_compute(f, cfg)
    mm = knn_match(feats.descriptors, db, ratio=0.75, q_valid=feats.keypoints.valid, db_valid=dbv)
    q, t = matched_points(feats.keypoints.xy, dbxy, mm)
    res = find_homography_ransac(q, t, valid=mm.valid, config=RansacConfig(num_hypotheses=256))
    return res.num_inliers
bench("v6 full homog", v6, frame, db_desc, db_xy, db_valid)
