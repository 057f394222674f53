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
