"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: replaces the reference's nonexistent multi-node tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubesat_apds_tpu.core.config import DESC_BYTES
from cubesat_apds_tpu.ops import match as M
from cubesat_apds_tpu.parallel.mesh import make_mesh, replicate, shard_db
from cubesat_apds_tpu.parallel.sharded_match import (
    make_sharded_knn2,
    sharded_knn_match,
)


def _rand_desc(rng, n):
    return rng.integers(0, 256, size=(n, DESC_BYTES), dtype=np.uint8)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(dp=2, tp=4)
    assert mesh2.shape == {"dp": 2, "tp": 4}


def test_sharded_knn2_matches_single_device(rng):
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 64)
    db = _rand_desc(rng, 512)          # 64 per shard
    qb, dbb = M.unpack_bits(q), M.unpack_bits(db)
    d0_ref, d1_ref, i0_ref = (np.asarray(x) for x in M.knn2(qb, dbb))
    fn = make_sharded_knn2(mesh)
    d0, d1, i0 = fn(qb, dbb, jnp.ones(512, bool))
    np.testing.assert_array_equal(np.asarray(d0), d0_ref)
    np.testing.assert_array_equal(np.asarray(d1), d1_ref)
    np.testing.assert_array_equal(np.asarray(i0), i0_ref)


def test_sharded_knn2_tie_break_matches(rng):
    """Exact duplicates across shards: global lowest index must win, same
    as the single-device path."""
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 16)
    db = np.tile(q, (8, 1))            # every shard holds a copy
    qb, dbb = M.unpack_bits(q), M.unpack_bits(db)
    d0_ref, d1_ref, i0_ref = (np.asarray(x) for x in M.knn2(qb, dbb))
    fn = make_sharded_knn2(mesh)
    d0, d1, i0 = fn(qb, dbb, jnp.ones(len(db), bool))
    np.testing.assert_array_equal(np.asarray(i0), i0_ref)
    np.testing.assert_array_equal(np.asarray(i0), np.arange(16))
    np.testing.assert_array_equal(np.asarray(d1), d1_ref)


def test_sharded_knn_match_semantics(rng):
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 32)
    db = np.concatenate([q, _rand_desc(rng, 32)])    # [64] → 8 per shard
    m_ref = M.knn_match(q, db, ratio=0.5)
    m = sharded_knn_match(mesh, q, db, ratio=0.5)
    np.testing.assert_array_equal(np.asarray(m.valid),
                                  np.asarray(m_ref.valid))
    np.testing.assert_array_equal(np.asarray(m.train_idx),
                                  np.asarray(m_ref.train_idx))


def test_sharded_respects_db_valid(rng):
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 8)
    db = np.concatenate([_rand_desc(rng, 56), q])    # copies in last shard
    db_valid = np.zeros(64, bool)
    db_valid[:56] = True
    m = sharded_knn_match(mesh, q, db, ratio=1.1,
                          db_valid=jnp.asarray(db_valid))
    assert (np.asarray(m.train_idx) < 56).all()
    assert (np.asarray(m.distance) > 0).all()


def test_explicit_device_placement(rng):
    """shard_db actually places shards on distinct devices."""
    mesh = make_mesh(dp=1, tp=8)
    db = jnp.asarray(_rand_desc(rng, 128))
    sharded = shard_db(mesh, db)
    assert len(sharded.sharding.device_set) == 8
    rep = replicate(mesh, jnp.ones(4))
    assert rep.sharding.is_fully_replicated


def test_batch_localizer_matches_single_device(rng):
    """The mesh-parallel serving step (parallel.serve) must agree with
    per-frame single-device localization: same match counts and
    near-identical homographies (GSPMD reorders f32 reductions)."""
    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, RansacConfig)
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.parallel.serve import (
        make_batch_localizer, shard_device_db)
    from cubesat_apds_tpu.pipelines.localize import (
        DeviceDb, localize_frame_jit)

    cfg = PipelineConfig(
        akaze=AkazeConfig(capacity=256),
        match=MatchConfig(ratio=0.75),
        ransac=RansacConfig(num_hypotheses=64))
    cam = CameraModel.ideal(100.0, 100.0, 64.0, 64.0)

    base = np.zeros((128, 128), np.float32)
    for _ in range(25):
        cy, cx = rng.integers(5, 100, 2)
        s = int(rng.integers(8, 20))
        base[cy:cy + s, cx:cx + s] = rng.uniform(0.3, 1.0)
    frames = np.stack([np.roll(base, i, axis=1) for i in range(4)])

    m = 1000   # deliberately NOT a tp multiple (pad path)
    desc = rng.integers(0, 256, (m, 61), dtype=np.uint8)
    xy = rng.uniform(0, 128, (m, 2)).astype(np.float32)
    db = DeviceDb(
        descriptors=jnp.asarray(desc), xy=jnp.asarray(xy),
        valid=jnp.ones(m, bool),
        obj_points=jnp.zeros((m, 3), jnp.float32), has_world=False)

    mesh = make_mesh(dp=2, tp=4)
    db_sh = shard_device_db(mesh, db)
    assert db_sh.descriptors.shape[0] % 4 == 0
    step = make_batch_localizer(mesh, cam, cfg, solve_pose=False)
    with jax.set_mesh(mesh):
        homog, pose, n_match, n_kp = step(jnp.asarray(frames), db_sh)
    assert pose is None

    for i in range(4):
        ref = localize_frame_jit(jnp.asarray(frames[i]), db, cam, cfg,
                                 solve_pose=False)
        assert int(n_kp[i]) == int(ref.num_keypoints)
        assert int(n_match[i]) == int(ref.num_matches)
        if bool(ref.homography.ok):
            assert bool(homog.ok[i])
            np.testing.assert_allclose(
                np.asarray(homog.H[i]), np.asarray(ref.homography.H),
                atol=2e-2)
