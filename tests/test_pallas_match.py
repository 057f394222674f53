"""Fused Pallas kNN-2 matcher: bit-equivalence vs the XLA reference path.

Runs the kernel in interpreter mode on the CPU suite (the Mosaic-compiled
path is exercised on real TPU by benchmarks/exp_r3l_pallas_match.py); the
interpreter executes the same kernel program, so indexing/merge/unpack
logic is covered here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cubesat_apds_tpu.ops.match import knn2, knn2_blockwise, unpack_bits
from cubesat_apds_tpu.ops.pallas.match_kernel import knn2_fused, pack_words


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _assert_knn_equal(ref, got):
    for name, a, b in zip(("d0", "d1", "i0"), ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)


def test_pack_words_roundtrip_bit_order(rng):
    """pack_words + the kernel's word-unpack order must reproduce
    unpack_bits' OpenCV bit order: bit b of little-endian word w is
    original bit 32*w + b."""
    p = rng.integers(0, 256, (16, 61), dtype=np.uint8)
    words = np.asarray(pack_words(p))
    bits_ref = np.asarray(unpack_bits(p))
    shifts = np.arange(32)
    bits_words = ((words[:, :, None] >> shifts) & 1)    # [N, 16, 32]
    assert np.array_equal(bits_words.reshape(16, 512), bits_ref)


VARIANTS = ("sweep", "tile")


@pytest.mark.parametrize("variant", VARIANTS)
def test_fused_matches_knn2_exact(rng, variant):
    q = rng.integers(0, 256, (96, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (3000, 61), dtype=np.uint8)
    qb = unpack_bits(q)
    ref = knn2(qb, unpack_bits(db))
    got = knn2_fused(qb, pack_words(db), q_tile=32, db_block=256,
                     variant=variant, interpret=True)
    _assert_knn_equal(ref, got)


@pytest.mark.parametrize("variant", VARIANTS)
def test_fused_validity_and_ragged(rng, variant):
    """Masked rows never match; ragged Q/M pad internally."""
    q = rng.integers(0, 256, (70, 61), dtype=np.uint8)        # 70 % 32 != 0
    db = rng.integers(0, 256, (1234, 61), dtype=np.uint8)     # ragged M
    dv = rng.random(1234) > 0.3
    qb = unpack_bits(q)
    ref = knn2(qb, unpack_bits(db), db_valid=jnp.asarray(dv))
    got = knn2_fused(qb, pack_words(db), jnp.asarray(dv), q_tile=32,
                     db_block=256, variant=variant, interpret=True)
    _assert_knn_equal(ref, got)
    # Winners must come from valid rows only.
    assert dv[np.asarray(got[2])].all()


@pytest.mark.parametrize("variant", VARIANTS)
def test_fused_tie_break_lowest_index(rng, variant):
    """Duplicate DB rows: best index is the LOWEST matching index and the
    duplicate remains eligible as second-best (OpenCV semantics)."""
    q = rng.integers(0, 256, (8, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (500, 61), dtype=np.uint8)
    db[137] = q[0]    # exact duplicates of query 0 at three indices,
    db[301] = q[0]    # spanning different kernel blocks
    db[493] = q[0]
    qb = unpack_bits(q)
    ref = knn2(qb, unpack_bits(db))
    got = knn2_fused(qb, pack_words(db), q_tile=8, db_block=128,
                     variant=variant, interpret=True)
    _assert_knn_equal(ref, got)
    d0, d1, i0 = (np.asarray(x) for x in got)
    assert i0[0] == 137 and d0[0] == 0.0 and d1[0] == 0.0


@pytest.mark.parametrize("variant", VARIANTS)
def test_fused_matches_blockwise_packed(rng, variant):
    """Same results as the production packed-DB scan path."""
    q = rng.integers(0, 256, (64, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (5000, 61), dtype=np.uint8)
    dv = rng.random(5000) > 0.1
    qb = unpack_bits(q)
    ref = knn2_blockwise(qb, jnp.asarray(db), 1024, jnp.asarray(dv))
    got = knn2_fused(qb, pack_words(db), jnp.asarray(dv), q_tile=32,
                     db_block=512, variant=variant, interpret=True)
    _assert_knn_equal(ref, got)


@pytest.mark.parametrize("variant", VARIANTS)
def test_fused_all_invalid_db(rng, variant):
    q = rng.integers(0, 256, (16, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (300, 61), dtype=np.uint8)
    dv = np.zeros(300, bool)
    got = knn2_fused(unpack_bits(q), pack_words(db), jnp.asarray(dv),
                     q_tile=16, db_block=128, variant=variant,
                     interpret=True)
    d0, d1, i0 = (np.asarray(x) for x in got)
    assert (d0 > 1e30).all() and (d1 > 1e30).all() and (i0 == 0).all()


def test_fused_prelaid_layout_reuse(rng):
    """A layout from layout_db_blocks (the once-per-DB serving form)
    gives the same results as the words form."""
    from cubesat_apds_tpu.ops.pallas.match_kernel import layout_db_blocks

    q = rng.integers(0, 256, (32, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (900, 61), dtype=np.uint8)
    dv = rng.random(900) > 0.2
    qb = unpack_bits(q)
    words = pack_words(db)
    ref = knn2_fused(qb, words, jnp.asarray(dv), q_tile=32, db_block=256,
                     interpret=True)
    layout = layout_db_blocks(words, jnp.asarray(dv), db_block=256)
    got = knn2_fused(qb, layout, q_tile=32, db_block=256, interpret=True)
    _assert_knn_equal(ref, got)


def test_knn_match_prelaid_layout(rng):
    """knn_match(db_layout=...) (the DeviceDb serving form) returns the
    same Matches as the layout-free fused path."""
    from cubesat_apds_tpu.ops.match import knn_match
    from cubesat_apds_tpu.ops.pallas.match_kernel import layout_db_blocks

    q = rng.integers(0, 256, (32, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (5000, 61), dtype=np.uint8)
    dv = np.ones(5000, bool); dv[::5] = False
    kw = dict(ratio=0.9, db_valid=jnp.asarray(dv), block=1024,
              kernel="fused")
    ref = knn_match(q, db, **kw)
    layout = layout_db_blocks(pack_words(db), jnp.asarray(dv))
    got = knn_match(q, db, db_layout=layout, **kw)
    for name in ("query_idx", "train_idx", "distance", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            name)


def test_knn_match_fused_kernel_selection(rng):
    """knn_match(kernel="fused") (interpreter off-TPU) returns the same
    Matches as the forced scan path in the big-DB branch."""
    from cubesat_apds_tpu.ops.match import knn_match

    q = rng.integers(0, 256, (48, 61), dtype=np.uint8)
    db = rng.integers(0, 256, (4000, 61), dtype=np.uint8)
    qv = np.ones(48, bool); qv[5] = False
    dv = np.ones(4000, bool); dv[::7] = False
    kw = dict(ratio=0.9, q_valid=jnp.asarray(qv), db_valid=jnp.asarray(dv),
              block=1024)
    ref = knn_match(q, db, kernel="scan", **kw)
    got = knn_match(q, db, kernel="fused", **kw)
    for name in ("query_idx", "train_idx", "distance", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            name)


def test_auto_variant_vmem_guard(rng, monkeypatch):
    """variant="auto" must not pick "sweep" past the measured Mosaic VMEM
    bound (qt*bm > 2^20 elements — the sweep kernel holds two [TQ, BM]
    int32 planes; qt=512/bm=4096 fails to compile on v5e)."""
    import cubesat_apds_tpu.ops.pallas.match_kernel as mk

    picked = {}
    orig = mk.pl.pallas_call

    def spy(kern, **kw):
        picked["grid"] = kw["grid"]
        return orig(kern, **kw)

    monkeypatch.setattr(mk.pl, "pallas_call", spy)
    q = jnp.asarray(rng.integers(0, 2, (64, 512)), jnp.int8)
    db = pack_words(rng.integers(0, 256, (8192, 61), dtype=np.uint8))

    # Default point (256*4096 = 2^20): sweep → grid = (nm, nq) = (2, 1).
    knn2_fused(q, db, interpret=True)
    assert picked["grid"] == (2, 1)
    # Oversized point (512*4096 > 2^20): falls back to tile → (nq, nm).
    knn2_fused(q, db, q_tile=512, interpret=True)
    assert picked["grid"] == (1, 2)
