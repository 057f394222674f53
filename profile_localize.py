import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig, MatchConfig, RansacConfig, PnPConfig
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.pipelines.localize import localize_frame_jit, DeviceDb
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute

rng = np.random.default_rng(42)
img = np.zeros((512,512), np.float32)
for _ in range(120):
    cy, cx = rng.integers(10, 462, 2); s = int(rng.integers(8,40))
    img[cy:cy+s, cx:cx+s] = rng.uniform(0.2,1.0)
frame = jnp.asarray(img)

config = PipelineConfig(
    akaze=AkazeConfig(capacity=2048),
    match=MatchConfig(ratio=0.75),
    ransac=RansacConfig(num_hypotheses=256),
    pnp=PnPConfig(num_hypotheses=64),
)
m = 10240
desc_db = rng.integers(0,256,(m,61),dtype=np.uint8)
xy_db = rng.uniform(0,512,(m,2)).astype(np.float32)
obj = np.concatenate([xy_db, np.zeros((m,1),np.float32)],axis=1)
db = DeviceDb(descriptors=jnp.asarray(desc_db), xy=jnp.asarray(xy_db),
              valid=jnp.ones(m,bool), obj_points=jnp.asarray(obj), has_world=True)
cam = CameraModel.ideal(500.,500.,256.,256.)

def bench(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:35s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

bench("localize full (pose)", functools.partial(localize_frame_jit, config=config, solve_pose=True), frame, db, cam)
bench("localize no pose", functools.partial(localize_frame_jit, config=config, solve_pose=False), frame, db, cam)

# pieces inside one jit
from cubesat_apds_tpu.ops.match import knn_match, matched_points
from cubesat_apds_tpu.ops.geometry.homography import find_homography_ransac

@jax.jit
def detect_only(frame):
    return detect_and_compute(frame, config.akaze)
bench("detect_and_compute", detect_only, frame)

@jax.jit
def detect_match(frame, db):
    f = detect_and_compute(frame, config.akaze)
    return knn_match(f.descriptors, db.descriptors, ratio=0.75,
                     q_valid=f.keypoints.valid, db_valid=db.valid, block=65536)
bench("detect+match", detect_match, frame, db)

@jax.jit
def detect_match_homog(frame, db):
    f = detect_and_compute(frame, config.akaze)
    mm = knn_match(f.descriptors, db.descriptors, ratio=0.75,
                   q_valid=f.keypoints.valid, db_valid=db.valid, block=65536)
    q,t = matched_points(f.keypoints.xy, db.xy, mm)
    return find_homography_ransac(q, t, valid=mm.valid, config=config.ransac)
bench("detect+match+homog", detect_match_homog, frame, db)
