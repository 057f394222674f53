import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig, MatchConfig, RansacConfig, PnPConfig
from cubesat_apds_tpu.ops.features.scale_space import build_scale_space
from cubesat_apds_tpu.ops.features.detect import detect_keypoints
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
from cubesat_apds_tpu.ops.match import knn_match, unpack_bits, knn2

rng = np.random.default_rng(42)
img = np.zeros((512,512), np.float32)
for _ in range(120):
    cy, cx = rng.integers(10, 462, 2); s = int(rng.integers(8,40))
    img[cy:cy+s, cx:cx+s] = rng.uniform(0.2,1.0)
frame = jnp.asarray(img)
cfg = AkazeConfig(capacity=2048)

def bench(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n*1000
    print(f"{name:30s} {dt:8.2f} ms")
    return out

ss_fn = jax.jit(lambda f: build_scale_space(f, cfg).Lt)
bench("scale_space", ss_fn, frame)

@jax.jit
def det_fn(f):
    ss = build_scale_space(f, cfg)
    kps, _, _ = detect_keypoints(ss, cfg, 2048)
    return kps
bench("scale_space+detect", det_fn, frame)

dc = functools.partial(detect_and_compute, config=cfg)
bench("detect_and_compute full", dc, frame)

q = rng.integers(0,256,(2048,61),dtype=np.uint8)
db = rng.integers(0,256,(10240,61),dtype=np.uint8)
match_fn = jax.jit(lambda q, db: knn_match(q, db, ratio=0.75))
bench("knn_match 2048x10240", match_fn, jnp.asarray(q), jnp.asarray(db))

from cubesat_apds_tpu.ops.geometry.homography import find_homography_ransac
src = jnp.asarray(rng.uniform(0,512,(2048,2)).astype(np.float32))
bench("ransac_homography 2048", functools.partial(find_homography_ransac), src, src)

from cubesat_apds_tpu.ops.geometry.pnp import solve_pnp_ransac
from cubesat_apds_tpu.core.types import CameraModel, Correspondences
cam = CameraModel.ideal(500.,500.,256.,256.)
corr = Correspondences(obj_points=jnp.asarray(rng.uniform(-1,1,(2048,3)).astype(np.float32)),
                       img_points=src, valid=jnp.ones(2048,bool))
bench("pnp_ransac 2048 (64 hyp)", functools.partial(solve_pnp_ransac, config=PnPConfig(num_hypotheses=64)), corr, cam)
