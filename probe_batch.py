import time, functools
import numpy as np
import jax, jax.numpy as jnp
from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig, MatchConfig, RansacConfig, PnPConfig
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.pipelines.localize import localize_frame_jit, DeviceDb

rng = np.random.default_rng(42)
def mkframe():
    img = np.zeros((512,512), np.float32)
    for _ in range(120):
        cy, cx = rng.integers(10, 462, 2); s = int(rng.integers(8,40))
        img[cy:cy+s, cx:cx+s] = rng.uniform(0.2,1.0)
    return img
config = PipelineConfig(akaze=AkazeConfig(capacity=2048), match=MatchConfig(ratio=0.75),
                        ransac=RansacConfig(num_hypotheses=256), pnp=PnPConfig(num_hypotheses=64))
m = 10240
db = DeviceDb(descriptors=jax.device_put(jnp.asarray(rng.integers(0,256,(m,61),dtype=np.uint8))),
              xy=jax.device_put(jnp.asarray(rng.uniform(0,512,(m,2)).astype(np.float32))),
              valid=jax.device_put(jnp.ones(m,bool)),
              obj_points=jax.device_put(jnp.zeros((m,3),jnp.float32)), has_world=True)
cam = CameraModel.ideal(500.,500.,256.,256.)

for B in (1, 4, 8):
    frames = jax.device_put(jnp.asarray(np.stack([mkframe() for _ in range(B)])))
    step1 = functools.partial(localize_frame_jit, config=config, solve_pose=True)
    stepB = jax.jit(jax.vmap(lambda f: step1(f, db, cam)))
    out = stepB(frames); jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter(); n=10
    for _ in range(n): out = stepB(frames)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    dt = (time.perf_counter()-t0)/n
    print(f"batch {B}: {dt*1000:7.2f} ms  -> {B/dt:7.1f} fps/chip", flush=True)
