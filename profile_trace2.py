import time, functools, glob, os, json, gzip, collections
import numpy as np
import jax, jax.numpy as jnp
from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig, MatchConfig, RansacConfig, PnPConfig
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.pipelines.localize import localize_frame_jit, DeviceDb

rng = np.random.default_rng(42)
img = np.zeros((512,512), np.float32)
for _ in range(120):
    cy, cx = rng.integers(10, 462, 2); s = int(rng.integers(8,40))
    img[cy:cy+s, cx:cx+s] = rng.uniform(0.2,1.0)
frame = jax.device_put(jnp.asarray(img))
config = PipelineConfig(akaze=AkazeConfig(capacity=2048), match=MatchConfig(ratio=0.75),
                        ransac=RansacConfig(num_hypotheses=256), pnp=PnPConfig(num_hypotheses=64))
m = 10240
db = DeviceDb(descriptors=jax.device_put(jnp.asarray(rng.integers(0,256,(m,61),dtype=np.uint8))),
              xy=jax.device_put(jnp.asarray(rng.uniform(0,512,(m,2)).astype(np.float32))),
              valid=jax.device_put(jnp.ones(m,bool)),
              obj_points=jax.device_put(jnp.zeros((m,3),jnp.float32)), has_world=True)
cam = CameraModel.ideal(500.,500.,256.,256.)
step = functools.partial(localize_frame_jit, config=config, solve_pose=True)
out = step(frame, db, cam); jax.block_until_ready(jax.tree_util.tree_leaves(out))
t0=time.perf_counter()
for _ in range(5): out = step(frame, db, cam)
jax.block_until_ready(jax.tree_util.tree_leaves(out))
print(f"per-iter: {(time.perf_counter()-t0)/5*1000:.2f} ms")

jax.profiler.start_trace("/tmp/jaxtrace2")
for _ in range(3): out = step(frame, db, cam)
jax.block_until_ready(jax.tree_util.tree_leaves(out))
jax.profiler.stop_trace()

files = glob.glob("/tmp/jaxtrace2/**/*.trace.json.gz", recursive=True)
with gzip.open(sorted(files)[-1]) as f:
    trace = json.load(f)
by_src = collections.Counter()
by_cat = collections.Counter()
for e in trace["traceEvents"]:
    if e.get("ph") == "X" and "dur" in e and "args" in e:
        a = e["args"]
        if "device_duration_ps" not in a: continue
        by_src[a.get("source", a.get("tf_op","?"))] += e["dur"]
        by_cat[a.get("hlo_category","?")] += e["dur"]
print("=== by source (ms over 3 iters) ===")
for s, d in by_src.most_common(22): print(f"{d/1000:9.2f}  {s}")
print("=== by category ===")
for s, d in by_cat.most_common(12): print(f"{d/1000:9.2f}  {s}")
