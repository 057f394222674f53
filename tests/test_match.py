"""Matcher semantics tests: Hamming-via-matmul, kNN ratio, crosscheck,
blockwise streaming (reference semantics: feature_extraction/src/lib.rs:94-126)."""

import numpy as np
import pytest

from cubesat_apds_tpu.core.config import DESC_BYTES
from cubesat_apds_tpu.ops import match as M


def _rand_desc(rng, n):
    return rng.integers(0, 256, size=(n, DESC_BYTES), dtype=np.uint8)


def _np_hamming(a, b):
    """Reference O(N·M) popcount hamming matrix on packed bytes."""
    axor = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(axor, axis=-1).sum(-1)


def test_pack_unpack_roundtrip(rng):
    d = _rand_desc(rng, 32)
    bits = np.asarray(M.unpack_bits(d))
    assert bits.shape == (32, 512)
    # Bits past 61*8=488 are zero padding.
    assert (bits[:, 488:] == 0).all()
    repacked = np.asarray(M.pack_bits(bits[:, :488]))
    np.testing.assert_array_equal(repacked, d)


def test_hamming_matrix_matches_numpy(rng):
    q = _rand_desc(rng, 17)
    db = _rand_desc(rng, 23)
    got = np.asarray(M.hamming_matrix(M.unpack_bits(q), M.unpack_bits(db)))
    np.testing.assert_array_equal(got, _np_hamming(q, db))


def test_knn_ratio_semantics(rng):
    q = _rand_desc(rng, 64)
    db = np.concatenate([q, _rand_desc(rng, 64)], axis=0)
    # Every query has an exact copy in the DB → d0 = 0 < d1·ratio always
    # (d1 > 0 for random data).
    m = M.knn_match(q, db, ratio=0.3)
    valid = np.asarray(m.valid)
    assert valid.all()
    np.testing.assert_array_equal(np.asarray(m.train_idx), np.arange(64))
    np.testing.assert_array_equal(np.asarray(m.distance), 0.0)


def test_knn_ratio_rejects_ambiguous(rng):
    q = _rand_desc(rng, 8)
    # DB = two copies of each query: d0 == d1 == 0 → ratio test must reject.
    db = np.concatenate([q, q], axis=0)
    m = M.knn_match(q, db, ratio=0.9)
    assert not np.asarray(m.valid).any()


def test_knn_tie_break_lowest_index(rng):
    q = _rand_desc(rng, 4)
    db = np.concatenate([_rand_desc(rng, 4), q, q], axis=0)
    m = M.knn_match(q, db, ratio=1.1)  # permissive: all pass unless d1==0
    # Best index must be the FIRST copy (indices 4..7), OpenCV tie-break.
    np.testing.assert_array_equal(np.asarray(m.train_idx), np.arange(4) + 4)


def test_crosscheck_mutual_nn(rng):
    a = _rand_desc(rng, 32)
    m = M.crosscheck_match(a, a[::-1].copy())
    # Identical sets reversed: i matches 31−i mutually.
    valid = np.asarray(m.valid)
    assert valid.all()
    np.testing.assert_array_equal(np.asarray(m.train_idx), 31 - np.arange(32))


def test_crosscheck_rejects_non_mutual(rng):
    # Construct: q0's best is db0, but db0's best is q1.
    q = np.zeros((2, DESC_BYTES), np.uint8)
    q[0, 0] = 0b00000111  # weight 3
    q[1, 0] = 0b00000001  # weight 1
    db = np.zeros((1, DESC_BYTES), np.uint8)
    db[0, 0] = 0b00000011  # weight 2 → dist(q0)=1, dist(q1)=1... make asymmetric
    q[0, 1] = 0b1  # now dist(q0,db0)=2, dist(q1,db0)=1 → db0's best is q1
    m = M.crosscheck_match(q, db)
    valid = np.asarray(m.valid)
    assert not valid[0] and valid[1]


def test_blockwise_equals_single_block(rng):
    q = _rand_desc(rng, 33)
    db = _rand_desc(rng, 256)
    qb, dbb = M.unpack_bits(q), M.unpack_bits(db)
    d0a, d1a, i0a = (np.asarray(x) for x in M.knn2(qb, dbb))
    d0b, d1b, i0b = (np.asarray(x) for x in M.knn2_blockwise(qb, dbb, block=64))
    np.testing.assert_array_equal(d0a, d0b)
    np.testing.assert_array_equal(d1a, d1b)
    np.testing.assert_array_equal(i0a, i0b)


def test_blockwise_respects_db_valid(rng):
    q = _rand_desc(rng, 8)
    db = np.concatenate([_rand_desc(rng, 64), q], axis=0)
    db_valid = np.ones(72, bool)
    db_valid[64:] = False  # mask out the exact copies
    qb, dbb = M.unpack_bits(q), M.unpack_bits(db)
    d0, _, i0 = (np.asarray(x) for x in M.knn2_blockwise(
        qb, dbb, block=24, db_valid=np.asarray(db_valid)))
    assert (i0 < 64).all()
    assert (d0 > 0).all()


def test_matched_points_gather(rng):
    from cubesat_apds_tpu.core.types import Matches
    import jax.numpy as jnp

    kq = jnp.asarray(rng.uniform(0, 100, (10, 2)), jnp.float32)
    kt = jnp.asarray(rng.uniform(0, 100, (12, 2)), jnp.float32)
    m = Matches(
        query_idx=jnp.array([1, 3], dtype=jnp.int32),
        train_idx=jnp.array([5, 7], dtype=jnp.int32),
        distance=jnp.zeros(2),
        valid=jnp.ones(2, bool),
    )
    qp, tp = M.matched_points(kq, kt, m)
    np.testing.assert_allclose(np.asarray(qp), np.asarray(kq)[[1, 3]])
    np.testing.assert_allclose(np.asarray(tp), np.asarray(kt)[[5, 7]])


def test_blockwise_pads_non_multiple_db(rng):
    """M not a multiple of block must pad with masked rows, not crash
    (serving DBs are padded to 2048, not to the 65536 match block)."""
    q = _rand_desc(rng, 16)
    db = _rand_desc(rng, 100)
    qb, dbb = M.unpack_bits(q), M.unpack_bits(db)
    d0a, d1a, i0a = (np.asarray(x) for x in M.knn2(qb, dbb))
    d0b, d1b, i0b = (np.asarray(x) for x in M.knn2_blockwise(qb, dbb, block=64))
    np.testing.assert_array_equal(d0a, d0b)
    np.testing.assert_array_equal(d1a, d1b)
    np.testing.assert_array_equal(i0a, i0b)
    # Packed path too, with a db_valid mask.
    packed = _rand_desc(rng, 100)
    valid = rng.random(100) > 0.2
    import jax.numpy as jnp

    a = M.knn2_blockwise(M.unpack_bits(packed), M.unpack_bits(packed), 64,
                         jnp.asarray(valid))
    b = M.knn2_blockwise(M.unpack_bits(packed), jnp.asarray(packed), 64,
                         jnp.asarray(valid))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_blockwise_rejects_ambiguous_uint8_bits(rng):
    """Unpacked 0/1 bits passed as uint8 must raise, not silently
    re-unpack into garbage distances."""
    q = _rand_desc(rng, 4)
    db = _rand_desc(rng, 64)
    qb = M.unpack_bits(q)
    bad = np.asarray(M.unpack_bits(db)).astype(np.uint8)
    with pytest.raises(ValueError):
        M.knn2_blockwise(qb, bad, 32)


def test_knn2_blockwise_packed_matches_unpacked(rng):
    """Packed-DB blockwise mode (uint8 rows, per-block unpack — 8× less
    HBM) must agree exactly with the unpacked-bit path."""
    q = rng.integers(0, 256, (64, DESC_BYTES), dtype=np.uint8)
    db = rng.integers(0, 256, (512, DESC_BYTES), dtype=np.uint8)
    valid = rng.random(512) > 0.1
    import jax.numpy as jnp

    qb = M.unpack_bits(q)
    a = M.knn2_blockwise(qb, M.unpack_bits(db), 128, jnp.asarray(valid))
    b = M.knn2_blockwise(qb, jnp.asarray(db), 128, jnp.asarray(valid))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
