"""Binary descriptor matching on the MXU.

Replaces OpenCV BFMatcher NORM_HAMMING (reference:
feature_extraction/src/lib.rs:94-126). Key idea: with descriptor bits
unpacked to {0,1} int8 vectors a, b of length B,

    hamming(a, b) = popcount(a) + popcount(b) − 2·(a · b)

so the full Q×M distance matrix is ONE int8 matmul on the systolic array
plus rank-1 corrections — instead of the reference's O(Q·M·B) scalar XOR
loop inside OpenCV. Descriptors are stored packed (61 bytes) and unpacked
to a padded 512-bit layout on device (512 = 4×128 lanes).

kNN (k=2) + Lowe ratio semantics follow get_knn_matches (lib.rs:94-114):
keep best iff d₀ < d₁·ratio. Crosscheck follows get_bruteforce_matches
(lib.rs:116-126): mutual nearest neighbours, OpenCV tie-breaking = lowest
index wins.

For DBs too large for one [Q, M] product, `knn2_blockwise` streams DB
blocks through a running (d0, d1, i0) merge — the "sequence-parallel"
analogue called out in SURVEY.md §2.3 — and `parallel.sharded_match`
shards the DB axis over a device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.core.config import DESC_BITS_PADDED
from cubesat_apds_tpu.core.types import Matches

_INVALID_DIST = jnp.float32(3.0e38)


def unpack_bits(packed):
    """uint8 [..., N, 61] packed (LSB-first per byte, OpenCV layout) →
    int8 [..., N, 512] in {0,1} (padded with zeros past bit 486)."""
    packed = jnp.asarray(packed, jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., :, :, None] >> shifts) & jnp.uint8(1)
    bits = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))
    pad = DESC_BITS_PADDED - bits.shape[-1]
    if pad > 0:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    return bits.astype(jnp.int8)


def pack_bits(bits):
    """{0,1} [..., N, B] → packed uint8 [..., N, ceil(B/8)] (LSB-first)."""
    bits = jnp.asarray(bits)
    n_bits = bits.shape[-1]
    n_bytes = (n_bits + 7) // 8
    pad = n_bytes * 8 - n_bits
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    b = bits.astype(jnp.uint8).reshape(bits.shape[:-1] + (n_bytes, 8))
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint8)


def hamming_matrix(q_bits, db_bits):
    """Full Hamming distance matrix via one MXU matmul.

    q_bits: int8 {0,1} [Q, B]; db_bits: int8 {0,1} [M, B] → int32 [Q, M].
    """
    dot = jax.lax.dot_general(
        q_bits, db_bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    pop_q = jnp.sum(q_bits.astype(jnp.int32), axis=-1)
    pop_db = jnp.sum(db_bits.astype(jnp.int32), axis=-1)
    return pop_q[:, None] + pop_db[None, :] - 2 * dot


# int32 tie-break keys: hamming distances are ≤ 512, so key = d·M + i
# stays below 2^31 for DBs up to ~4M entries (larger DBs go through the
# blockwise path where M is the block size). TPU-friendly: no int64.
_INVALID_KEY = jnp.int32(2**31 - 1)


def _top2_with_index(dist, db_valid=None):
    """Per-row two smallest distances + best index, OpenCV tie-break
    (lowest index wins among equal distances)."""
    m = dist.shape[1]
    assert 512 * (m + 1) < 2**31 - 1, "DB block too large for int32 keys"
    d_i = jnp.clip(dist, 0, None).astype(jnp.int32)
    idx = jnp.arange(m, dtype=jnp.int32)
    key = d_i * m + idx[None, :]
    if db_valid is not None:
        key = jnp.where(db_valid[None, :], key, _INVALID_KEY)
    best_key = jnp.min(key, axis=1)
    invalid0 = best_key == _INVALID_KEY
    i0 = jnp.where(invalid0, 0, best_key % m).astype(jnp.int32)
    d0 = jnp.where(invalid0, _INVALID_DIST,
                   (best_key // m).astype(jnp.float32))
    key2 = jnp.where(key == best_key[:, None], _INVALID_KEY, key)
    second_key = jnp.min(key2, axis=1)
    invalid1 = second_key == _INVALID_KEY
    d1 = jnp.where(invalid1, _INVALID_DIST,
                   (second_key // m).astype(jnp.float32))
    return d0, d1, i0


@functools.partial(jax.jit, static_argnames=())
def knn2(q_bits, db_bits, q_valid=None, db_valid=None):
    """(d0, d1, i0) for each query against the whole DB. Single block."""
    dist = hamming_matrix(q_bits, db_bits)
    d0, d1, i0 = _top2_with_index(dist, db_valid)
    if q_valid is not None:
        d0 = jnp.where(q_valid, d0, _INVALID_DIST)
        d1 = jnp.where(q_valid, d1, _INVALID_DIST)
    return d0, d1, i0


def knn2_blockwise(q_bits, db_bits, block: int, db_valid=None):
    """Streaming top-2 merge over DB blocks (large-DB path, BASELINE cfg 4).

    db_bits: [M, 512] unpacked int8 bits, OR [M, ≤64] PACKED uint8 rows —
    packed rows unpack per block inside the scan (8× less HBM; the
    serving path keeps the whole DB packed). If M is not a multiple of
    `block` the DB is padded here with masked rows. Keeps only O(Q)
    state between blocks; each block is one MXU matmul.
    """
    m = db_bits.shape[0]
    # Packed-DB mode: uint8 byte rows unpack to bits PER BLOCK inside
    # the scan, so HBM holds 61 B/descriptor instead of 512 B of
    # unpacked int8 bits — 8× more DB per chip on the same matcher.
    # Discriminate on ROW WIDTH, not just dtype: a caller passing
    # unpacked 0/1 bits as uint8 (e.g. np.unpackbits output) must not be
    # re-unpacked into garbage.
    if db_bits.shape[1] <= DESC_BITS_PADDED // 8:
        packed = True
    elif db_bits.shape[1] == DESC_BITS_PADDED:
        packed = db_bits.dtype == jnp.uint8
        if packed:
            raise ValueError(
                "ambiguous db_bits: width 512 uint8 — pass unpacked bits "
                "as int8 {0,1} or packed rows as uint8 [M, 61]")
    else:
        raise ValueError(f"bad db_bits width {db_bits.shape[1]}: expected "
                         f"packed ≤{DESC_BITS_PADDED // 8} or unpacked "
                         f"{DESC_BITS_PADDED}")
    if m % block:
        pad = block * ((m + block - 1) // block) - m
        if db_valid is None:
            db_valid = jnp.ones((m,), bool)
        db_bits = jnp.pad(db_bits, ((0, pad), (0, 0)))
        db_valid = jnp.pad(db_valid, (0, pad))
        m += pad
    n_blocks = m // block
    q = q_bits.shape[0]

    db_blocks = db_bits.reshape(n_blocks, block, db_bits.shape[1])
    valid_blocks = (
        db_valid.reshape(n_blocks, block) if db_valid is not None
        else jnp.ones((n_blocks, block), bool)
    )

    def body(carry, xs):
        d0, d1, i0 = carry
        blk, vblk, start = xs
        if packed:
            blk = unpack_bits(blk)
        dist = hamming_matrix(q_bits, blk)
        bd0, bd1, bi0 = _top2_with_index(dist, vblk)
        bi0 = bi0 + start
        # Merge {(d0,i0), d1} with {(bd0,bi0), bd1}: new best is the min,
        # new second-best is min of the remaining three.
        take_new = (bd0 < d0) | ((bd0 == d0) & (bi0 < i0))
        nd0 = jnp.where(take_new, bd0, d0)
        ni0 = jnp.where(take_new, bi0, i0)
        loser = jnp.where(take_new, d0, bd0)
        nd1 = jnp.minimum(jnp.minimum(d1, bd1), loser)
        return (nd0, nd1, ni0), None

    init = (
        jnp.full((q,), _INVALID_DIST),
        jnp.full((q,), _INVALID_DIST),
        jnp.zeros((q,), jnp.int32),
    )
    starts = jnp.arange(n_blocks, dtype=jnp.int32) * block
    (d0, d1, i0), _ = jax.lax.scan(body, init, (db_blocks, valid_blocks, starts))
    return d0, d1, i0


def _ratio_matches(d0, d1, i0, ratio: float) -> Matches:
    """Lowe ratio gate + Matches construction (shared by every k=2
    matching front-end: keep m0 iff d0 < d1·ratio, lib.rs:108)."""
    good = (d0 < d1 * ratio) & (d0 < _INVALID_DIST)
    return Matches(
        query_idx=jnp.arange(d0.shape[0], dtype=jnp.int32),
        train_idx=i0,
        distance=d0,
        valid=good,
    )


def knn_match(q_desc_packed, db_desc_packed, ratio: float = 0.3,
              q_valid=None, db_valid=None, block: int | None = None,
              kernel: str = "auto", db_layout=None) -> Matches:
    """get_knn_matches equivalent (reference lib.rs:94-114): k=2 + Lowe ratio.

    Inputs are packed uint8 descriptors; returns fixed-capacity Matches of
    size Q (one potential match per query, masked by the ratio test).

    kernel: "auto" picks the fused Pallas kNN-2 kernel for the big-DB
    branch on TPU (bit-identical to the scan, ~5× faster — the distance
    tile never leaves VMEM), the XLA scan elsewhere; "scan"/"fused"
    force a path ("fused" off-TPU runs the kernel interpreter — tests).
    db_layout: optional pre-computed (blocks, vpop) layout for the fused
    kernel (ops.pallas.match_kernel.layout_db_blocks) — serving paths
    compute it once per DB so repeated frames skip the repack. Must
    describe the same (db_desc_packed, db_valid); ignored on the scan
    path.
    """
    qb = unpack_bits(q_desc_packed)
    if block is not None and db_desc_packed.shape[0] > block:
        on_tpu = jax.default_backend() == "tpu"
        if kernel == "fused" or (kernel == "auto" and on_tpu):
            from cubesat_apds_tpu.ops.pallas.match_kernel import (
                knn2_fused, pack_words)
            if db_layout is not None:
                d0, d1, i0 = knn2_fused(qb, db_layout,
                                        interpret=not on_tpu)
            else:
                d0, d1, i0 = knn2_fused(qb, pack_words(db_desc_packed),
                                        db_valid, interpret=not on_tpu)
        else:
            # Pass the DB PACKED: knn2_blockwise unpacks per block inside
            # its scan, so HBM never holds the 8× unpacked bit array.
            d0, d1, i0 = knn2_blockwise(qb, jnp.asarray(db_desc_packed),
                                        block, db_valid)
        if q_valid is not None:
            d0 = jnp.where(q_valid, d0, _INVALID_DIST)
    else:
        d0, d1, i0 = knn2(qb, unpack_bits(db_desc_packed), q_valid, db_valid)
    return _ratio_matches(d0, d1, i0, ratio)


def knn_match_bits(q_bits, db_bits, ratio: float = 0.3,
                   q_valid=None, db_valid=None,
                   q_block: int | None = None) -> Matches:
    """knn_match on pre-unpacked bit arrays, with optional QUERY
    chunking: the GSPMD tp-sharded serving path (parallel.serve) cannot
    stream DB blocks — dynamic slices along the sharded axis gather
    across chips — so the [q_block, M] distance matrix is bounded along
    the replicated query axis instead."""
    Q = q_bits.shape[0]
    if q_block is None or Q <= q_block:
        d0, d1, i0 = knn2(q_bits, db_bits, q_valid, db_valid)
    else:
        parts = []
        for s in range(0, Q, q_block):
            qv = None if q_valid is None else q_valid[s:s + q_block]
            parts.append(knn2(q_bits[s:s + q_block], db_bits, qv, db_valid))
        d0 = jnp.concatenate([p[0] for p in parts])
        d1 = jnp.concatenate([p[1] for p in parts])
        i0 = jnp.concatenate([p[2] for p in parts])
    return _ratio_matches(d0, d1, i0, ratio)


def knn_matches_k(q_desc_packed, db_desc_packed, k: int,
                  q_valid=None, db_valid=None):
    """General k-nearest-neighbour search (the `k` parameter of
    get_knn_matches, reference lib.rs:94-103; the pipeline itself only
    consumes k=2 via knn_match).

    Returns (distances [Q, k] float32, indices [Q, k] int32), ordered by
    (distance, index) exactly like OpenCV's knnMatch. Entries beyond the
    number of valid DB rows carry the invalid sentinel distance.
    """
    qb = unpack_bits(q_desc_packed)
    db = unpack_bits(db_desc_packed)
    dist = hamming_matrix(qb, db)
    m = dist.shape[1]
    assert 512 * (m + 1) < 2**31 - 1
    idx = jnp.arange(m, dtype=jnp.int32)
    key = dist * m + idx[None, :]
    if db_valid is not None:
        key = jnp.where(db_valid[None, :], key, _INVALID_KEY)
    neg_top, _ = jax.lax.top_k(-key, k)
    top_key = -neg_top                                    # ascending keys
    invalid = top_key == _INVALID_KEY
    d = jnp.where(invalid, _INVALID_DIST,
                  (top_key // m).astype(jnp.float32))
    i = jnp.where(invalid, 0, top_key % m).astype(jnp.int32)
    if q_valid is not None:
        d = jnp.where(q_valid[:, None], d, _INVALID_DIST)
    return d, i


def crosscheck_match(q_desc_packed, db_desc_packed,
                     q_valid=None, db_valid=None) -> Matches:
    """get_bruteforce_matches equivalent (reference lib.rs:116-126):
    BFMatcher(NORM_HAMMING, crosscheck=true) = mutual nearest neighbours."""
    qb = unpack_bits(q_desc_packed)
    db = unpack_bits(db_desc_packed)
    dist = hamming_matrix(qb, db)
    d0, _, i0 = _top2_with_index(dist, db_valid)
    # Reverse direction: for each train, its best query.
    d0_r, _, i0_r = _top2_with_index(dist.T, q_valid)
    mutual = i0_r[i0] == jnp.arange(qb.shape[0], dtype=jnp.int32)
    ok = mutual & (d0 < _INVALID_DIST)
    if q_valid is not None:
        ok = ok & q_valid
    return Matches(
        query_idx=jnp.arange(qb.shape[0], dtype=jnp.int32),
        train_idx=i0,
        distance=d0,
        valid=ok,
    )


def matched_points(kp_query_xy, kp_train_xy, matches: Matches):
    """Gather matched point pairs (fixed capacity; use matches.valid).

    Equivalent in intent to get_points_from_matches (reference
    lib.rs:161-180) — note the reference has two known bugs there (uses
    img_idx, and duplicates img1 points into both outputs; SURVEY.md §2
    flags them as do-not-replicate). Here: query points from query_idx,
    train points from train_idx.
    """
    q_pts = kp_query_xy[matches.query_idx]
    t_pts = kp_train_xy[matches.train_idx]
    return q_pts, t_pts
