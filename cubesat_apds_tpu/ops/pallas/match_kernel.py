"""Fused Hamming kNN-2 Pallas kernel for the large-DB matcher.

Replaces the XLA scan path of `ops.match.knn2_blockwise` (itself the
TPU-native form of OpenCV BFMatcher NORM_HAMMING knnMatch(k=2), reference
feature_extraction/src/lib.rs:94-114) for production-scale DBs.

Why a kernel: the XLA scan computes each [Q, block] Hamming tile with an
MXU matmul whose output round-trips HBM before the top-2 reduction reads
it back — ~8.6 GB of distance/key traffic per 2048×1M pass, an order of
magnitude above the matmul's compute time (measured 60 ms/pass vs a
~5 ms int8-matmul floor, PERF.md "Large-DB matching"). Here the distance
tile lives and dies in VMEM:

    grid = (Q/TQ, M/BM)            # m innermost: sequential top-2 merge
    per step: unpack a [BM, 61]-byte packed block (shipped as int32
    words, pre-transposed to [16, BM]) into a [512, BM] bit matrix,
    one MXU matmul [TQ,512]x[512,BM], then a masked three-pass min
    reduction straight out of registers/VMEM into a [TQ] running
    (best, second, index) carried in VMEM scratch across the m sweep.

HBM traffic per pass drops to the packed DB bytes re-streamed once per
query tile (61 B/descriptor), and the reduction is fused with its
producer.

Bit order: the in-kernel unpack (little-endian int32 words, LSB-first)
reproduces `ops.match.unpack_bits`' OpenCV byte order exactly — bit
index = 8*byte + bit = 32*word + bit-in-word — so distances are
bit-identical to the XLA path (property-tested in
tests/test_pallas_match.py).

The kernel carries rowdist = popcount(db) - 2*(q.db) instead of the full
Hamming distance: per query row the popcount(q) term is constant, so
argmin/top-2 order is unchanged, and the wrapper adds it back at the
end. This keeps the in-kernel popcount to the db side, computed from the
packed words with the classic SWAR bit-trick on [16, BM] int32 (no
[512, BM] int32 materialization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cubesat_apds_tpu.core.config import DESC_BITS_PADDED

_WORDS = DESC_BITS_PADDED // 32          # 16 int32 words per descriptor
_BIG = jnp.int32(1 << 29)                # invalid-rowdist sentinel
_INVALID_DIST = jnp.float32(3.0e38)      # matches ops.match._INVALID_DIST


def pack_words(db_packed):
    """uint8 [M, 61] packed rows -> int32 [M, 16] little-endian words.

    Pads bytes 61..63 with zero (bits 488..511, consistent with the
    zero-padding `unpack_bits` applies past bit 486).
    """
    db_packed = jnp.asarray(db_packed, jnp.uint8)
    m, nb = db_packed.shape
    pad = _WORDS * 4 - nb
    if pad < 0:
        raise ValueError(f"packed rows wider than {_WORDS * 4} bytes: {nb}")
    if pad:
        db_packed = jnp.pad(db_packed, ((0, 0), (0, pad)))
    grouped = db_packed.reshape(m, _WORDS, 4)
    return jax.lax.bitcast_convert_type(grouped, jnp.int32)


def _popcount32(w):
    """SWAR popcount on int32 (elementwise)."""
    w = w - ((w >> 1) & 0x55555555)
    w = (w & 0x33333333) + ((w >> 2) & 0x33333333)
    w = (w + (w >> 4)) & 0x0F0F0F0F
    return (w * 0x01010101) >> 24


def _kernel(q_ref, dbw_ref, valid_ref, out_ref, acc_ref, *,
            block_m: int, mxu_dtype):
    j = pl.program_id(1)
    nm = pl.num_programs(1)
    big = jnp.int32(1 << 29)

    @pl.when(j == 0)
    def _init():
        acc_ref[:, :] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1) < 2,
            big, 0)

    words = dbw_ref[0]                                   # [16, BM] int32
    # Unpack to a [512, BM] bit matrix: bit b of word w -> row 32*w + b,
    # which equals the OpenCV bit index (little-endian words, LSB-first).
    shifts = jax.lax.broadcasted_iota(jnp.int32, (_WORDS, 32, 1), 1)
    bits = ((words[:, None, :] >> shifts) & 1)           # [16, 32, BM]
    bits_t = bits.reshape(DESC_BITS_PADDED, block_m)     # [512, BM]

    if mxu_dtype == jnp.int8:
        dot = jax.lax.dot_general(
            q_ref[:, :], bits_t.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        # bf16 fallback: products are 0/1 and the f32 accumulation is
        # exact for sums <= 512, so distances stay bit-identical.
        dot = jax.lax.dot_general(
            q_ref[:, :].astype(mxu_dtype), bits_t.astype(mxu_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    popdb = jnp.sum(_popcount32(words), axis=0, keepdims=True)  # [1, BM]
    rowdist = popdb - 2 * dot                            # [TQ, BM]

    col = jax.lax.broadcasted_iota(jnp.int32, rowdist.shape, 1)
    dm = jnp.where(valid_ref[0, 0:1, :] != 0, rowdist, big)
    bd0 = jnp.min(dm, axis=1, keepdims=True)             # [TQ, 1]
    # First column index achieving the min = OpenCV lowest-index
    # tie-break within the block.
    bi = jnp.min(jnp.where(dm == bd0, col, jnp.int32(2 ** 30)),
                 axis=1, keepdims=True)
    # Second best: exclude only that one column (equal distances at
    # other indices remain eligible).
    bd1 = jnp.min(jnp.where(col == bi, big, dm), axis=1, keepdims=True)
    bi_g = jnp.int32(block_m) * j + bi
    bi_g = jnp.where(bd0 >= big, 0, bi_g)

    s0 = acc_ref[:, 0:1]
    s1 = acc_ref[:, 1:2]
    si = acc_ref[:, 2:3]
    better = (bd0 < s0) | ((bd0 == s0) & (bi_g < si))
    n0 = jnp.where(better, bd0, s0)
    ni = jnp.where(better, bi_g, si)
    loser = jnp.where(better, s0, bd0)
    n1 = jnp.minimum(jnp.minimum(s1, bd1), loser)
    acc_ref[:, 0:1] = n0
    acc_ref[:, 1:2] = n1
    acc_ref[:, 2:3] = ni

    @pl.when(j == nm - 1)
    def _emit():
        c = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
        out_ref[:, :] = jnp.where(
            c == 0, n0, jnp.where(c == 1, n1, jnp.where(c == 2, ni, 0)))


def layout_db_blocks(db_words, db_valid=None, *, db_block: int = 4096):
    """Pre-compute the kernel's DB layout: ([nm, 16, BM] int32 word
    blocks, [nm, BM] int32 validity). Serving paths call this ONCE per
    DB so repeated queries skip the reshape/transpose."""
    db_words = jnp.asarray(db_words, jnp.int32)
    m = db_words.shape[0]
    assert db_words.shape[1] == _WORDS, db_words.shape
    valid = (jnp.ones((m,), jnp.int32) if db_valid is None
             else jnp.asarray(db_valid).astype(jnp.int32))
    m_pad = (-m) % db_block
    if m_pad:
        db_words = jnp.pad(db_words, ((0, m_pad), (0, 0)))
        valid = jnp.pad(valid, (0, m_pad))
    nm = (m + m_pad) // db_block
    dbw_t = db_words.reshape(nm, db_block, _WORDS).transpose(0, 2, 1)
    # [nm, 1, BM]: the unit middle axis keeps the last-two block dims
    # equal to the array dims (a Mosaic block-shape requirement).
    return dbw_t, valid.reshape(nm, 1, db_block)


@functools.partial(jax.jit, static_argnames=(
    "q_tile", "db_block", "mxu", "interpret"))
def knn2_fused(q_bits, db_words, db_valid=None, *, q_tile: int = 512,
               db_block: int = 4096, mxu: str = "int8",
               interpret: bool = False):
    """Fused-kernel (d0, d1, i0): drop-in for `ops.match.knn2` semantics.

    q_bits:   int8 {0,1} [Q, 512] unpacked query bits.
    db_words: int32 [M, 16] packed words (`pack_words`), little-endian —
              OR a pre-laid-out (blocks, valid) pair from
              `layout_db_blocks` (then db_valid must be None).
    db_valid: optional bool [M]; invalid rows never match.

    Returns (d0 f32 [Q], d1 f32 [Q], i0 int32 [Q]) with the same
    sentinel/tie-break semantics as knn2/knn2_blockwise.

    Defaults (q_tile=512, db_block=4096) are the measured v5e operating
    point: 10.8 ms / 2048×1M pass = 198 G cmp/s, 5.6× the XLA scan
    (sweep in benchmarks/exp_r3l_pallas_match.py; PERF.md "Large-DB
    matching").
    """
    q_bits = jnp.asarray(q_bits, jnp.int8)
    q, bwidth = q_bits.shape
    assert bwidth == DESC_BITS_PADDED, q_bits.shape

    if isinstance(db_words, tuple):
        assert db_valid is None, "validity is baked into the layout"
        dbw_t, valid_b = db_words
        assert dbw_t.shape[1] == _WORDS and dbw_t.shape[2] == db_block
    else:
        dbw_t, valid_b = layout_db_blocks(db_words, db_valid,
                                          db_block=db_block)
    nm = dbw_t.shape[0]

    q_pad = (-q) % q_tile
    if q_pad:
        q_bits = jnp.pad(q_bits, ((0, q_pad), (0, 0)))
    qp = q + q_pad
    nq = qp // q_tile

    mxu_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16,
                 "f32": jnp.float32}[mxu]
    kern = functools.partial(_kernel, block_m=db_block, mxu_dtype=mxu_dtype)

    out = pl.pallas_call(
        kern,
        grid=(nq, nm),
        in_specs=[
            pl.BlockSpec((q_tile, DESC_BITS_PADDED), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WORDS, db_block), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, db_block), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((q_tile, 128), jnp.int32)],
        interpret=interpret,
    )(q_bits, dbw_t, valid_b)

    out = out[:q]
    popq = jnp.sum(q_bits[:q].astype(jnp.int32), axis=-1)
    r0, r1, i0 = out[:, 0], out[:, 1], out[:, 2]
    d0 = jnp.where(r0 >= _BIG, _INVALID_DIST, (r0 + popq).astype(jnp.float32))
    d1 = jnp.where(r1 >= _BIG, _INVALID_DIST, (r1 + popq).astype(jnp.float32))
    return d0, d1, i0
