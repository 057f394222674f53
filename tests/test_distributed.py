"""Multi-HOST (multi-process) mesh tests — the DCN leg of SURVEY §2.3.

The reference is single-process; its only cross-process channel is
Postgres. The TPU-native comm backend is jax.distributed + a global
mesh: these tests spawn TWO real processes, each owning 4 virtual CPU
devices, wire them through parallel.mesh.initialize_distributed (gloo
CPU collectives), and assert the 2-process × 4-device GSPMD serving
step and the shard_map DB matcher produce EXACTLY what the
single-process path produces — the multi-host equivalence the
dryrun_multichip hook can't cover (it is single-process).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _scene(seed: int = 11):
    """Deterministic inputs shared by workers and the in-process ref."""
    rng = np.random.default_rng(seed)
    base = np.zeros((128, 128), np.float32)
    for _ in range(25):
        cy, cx = rng.integers(5, 100, 2)
        s = int(rng.integers(8, 20))
        base[cy:cy + s, cx:cx + s] = rng.uniform(0.3, 1.0)
    frames = np.stack([np.roll(base, i, axis=1) for i in range(4)])
    q = rng.integers(0, 256, (64, 61), dtype=np.uint8)
    dbm = np.concatenate([q[:32], rng.integers(0, 256, (480, 61),
                                               dtype=np.uint8)])
    return base, frames, q, dbm


def _scene_db(base, cfg, seed: int = 12):
    """DB arrays: REAL descriptors extracted from the base scene (so the
    frames genuinely localize — random rows never pass the RANSAC
    degeneracy guard) + deterministic filler. Identical in the workers
    and the parent (single-device CPU detection is deterministic)."""
    import jax.numpy as jnp

    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute

    feats = detect_and_compute(jnp.asarray(base), cfg.akaze)
    rng = np.random.default_rng(seed)
    m = 1000
    desc = rng.integers(0, 256, (m, 61), dtype=np.uint8)
    xy = rng.uniform(0, 128, (m, 2)).astype(np.float32)
    valid = np.ones(m, bool)
    cap = feats.descriptors.shape[0]
    desc[:cap] = np.asarray(feats.descriptors)
    xy[:cap] = np.asarray(feats.keypoints.xy)
    valid[:cap] = np.asarray(feats.keypoints.valid)
    return desc, xy, valid


_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["APDS_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from cubesat_apds_tpu.parallel.mesh import initialize_distributed, make_mesh
assert initialize_distributed(), "no distributed config"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, os.path.join(os.environ["APDS_REPO"], "tests"))
from test_distributed import _scene, _scene_db
from cubesat_apds_tpu.core.config import (AkazeConfig, MatchConfig,
    PipelineConfig, RansacConfig)
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.ops import match as M
from cubesat_apds_tpu.parallel.serve import (make_batch_localizer,
    shard_device_db)
from cubesat_apds_tpu.parallel.sharded_match import make_sharded_knn2
from cubesat_apds_tpu.pipelines.localize import DeviceDb

base, frames, q, dbm = _scene()
cfg = PipelineConfig(akaze=AkazeConfig(capacity=256),
                     match=MatchConfig(ratio=0.75),
                     ransac=RansacConfig(num_hypotheses=64))
cam = CameraModel.ideal(100.0, 100.0, 64.0, 64.0)
desc, xy, db_valid = _scene_db(base, cfg)
mesh = make_mesh(dp=2, tp=4)

# --- GSPMD batch-serving step over the 2-process mesh ---
db = DeviceDb(descriptors=jnp.asarray(desc), xy=jnp.asarray(xy),
              valid=jnp.asarray(db_valid),
              obj_points=jnp.zeros((len(desc), 3), jnp.float32),
              has_world=False)
db_sh = shard_device_db(mesh, db)
step = make_batch_localizer(mesh, cam, cfg, solve_pose=False)
with jax.set_mesh(mesh):
    homog, pose, n_match, n_kp = step(jnp.asarray(frames), db_sh)

# --- shard_map DB matcher over the 2-process mesh ---
knn = make_sharded_knn2(mesh)
qb, dbb = M.unpack_bits(jnp.asarray(q)), M.unpack_bits(jnp.asarray(dbm))
qb_g = jax.device_put(qb, NamedSharding(mesh, P()))
dbb_g = jax.device_put(dbb, NamedSharding(mesh, P("tp")))
v_g = jax.device_put(jnp.ones(len(dbm), bool), NamedSharding(mesh, P("tp")))
d0, d1, i0 = knn(qb_g, dbb_g, v_g)

# Replicate outputs so every process can fetch them whole.
rep = jax.jit(lambda t: t, out_shardings=NamedSharding(mesh, P()))
out = rep({"H": homog.H, "ok": homog.ok,
           "n_match": n_match, "n_kp": n_kp,
           "d0": d0, "d1": d1, "i0": i0})
out = {k: np.asarray(v) for k, v in out.items()}
if jax.process_index() == 0:
    np.savez(os.environ["APDS_OUT"], **out)
print("WORKER_DONE", jax.process_index(), flush=True)
"""


def test_two_process_mesh_equivalence(tmp_path):
    port = _free_port()
    out = str(tmp_path / "proc0.npz")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            APDS_REPO=_REPO,
            APDS_OUT=out,
            APDS_COORDINATOR=f"127.0.0.1:{port}",
            APDS_NUM_PROCESSES="2",
            APDS_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        env.pop("JAX_PLATFORMS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        # Workers must not inherit the suite's compile-cache dir: two
        # fresh processes writing it concurrently can abort (conftest).
        env.pop("APDS_TEST_CACHE_DIR", None)
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(subprocess.Popen(
            [sys.executable, script, str(pid)],
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=850)
        outs.append((p.returncode, so.decode(), se.decode()))
    for rc, so, se in outs:
        assert rc == 0, f"worker failed:\n{se[-4000:]}"
        assert "WORKER_DONE" in so

    got = np.load(out)

    # In-process single-device references (this process runs on the
    # conftest 8-device CPU mesh; the reference path is single-device).
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, RansacConfig)
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.ops import match as M
    from cubesat_apds_tpu.pipelines.localize import (
        DeviceDb, localize_frame_jit)

    base, frames, q, dbm = _scene()
    cfg = PipelineConfig(akaze=AkazeConfig(capacity=256),
                         match=MatchConfig(ratio=0.75),
                         ransac=RansacConfig(num_hypotheses=64))
    cam = CameraModel.ideal(100.0, 100.0, 64.0, 64.0)
    desc, xy, db_valid = _scene_db(base, cfg)
    db = DeviceDb(descriptors=jnp.asarray(desc), xy=jnp.asarray(xy),
                  valid=jnp.asarray(db_valid),
                  obj_points=jnp.zeros((len(desc), 3), jnp.float32),
                  has_world=False)
    any_ok = False
    for i in range(4):
        ref = localize_frame_jit(jnp.asarray(frames[i]), db, cam, cfg,
                                 solve_pose=False)
        assert int(got["n_kp"][i]) == int(ref.num_keypoints)
        assert int(got["n_match"][i]) == int(ref.num_matches)
        if bool(ref.homography.ok):
            any_ok = True
            assert bool(got["ok"][i])
            np.testing.assert_allclose(got["H"][i],
                                       np.asarray(ref.homography.H),
                                       atol=2e-2)
    assert any_ok  # the scene must actually localize

    d0_ref, d1_ref, i0_ref = (np.asarray(x) for x in M.knn2(
        M.unpack_bits(jnp.asarray(q)), M.unpack_bits(jnp.asarray(dbm))))
    np.testing.assert_array_equal(got["d0"], d0_ref)
    np.testing.assert_array_equal(got["d1"], d1_ref)
    np.testing.assert_array_equal(got["i0"], i0_ref)


def test_initialize_distributed_noop_without_config(monkeypatch):
    """No coordinator configured → returns False, touches nothing."""
    from cubesat_apds_tpu.parallel.mesh import initialize_distributed

    for k in ("APDS_COORDINATOR", "APDS_NUM_PROCESSES", "APDS_PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False
