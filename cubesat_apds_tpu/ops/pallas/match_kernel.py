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

    grid = (M/BM, Q/TQ)            # DB block outer, query tile inner
    per DB block: unpack its [16, BM]-int32 packed words (pre-transposed
    by `layout_db_blocks`) ONCE into a [512, BM] int8 bit matrix held in
    VMEM scratch; every query tile then runs one MXU matmul
    [TQ,512]×[512,BM] and folds a keyed two-pass min straight into its
    [TQ, 3] running (best, second, index) slice of a VMEM accumulator
    carried across the M sweep.

With the DB block outermost the bit-unpack amortizes over all Q/TQ query
tiles and the packed DB streams from HBM exactly ONCE per pass
(61 B/descriptor); the reduction is fused with its producer. The
row-validity mask and the per-row popcount(db) are folded into one
pre-computed `vpop` plane (valid → popcount, invalid → huge), so the
kernel's epilogue is: rowdist = vpop − 2·dot, then two keyed min passes.
(`variant="tile"` keeps the query-outer grid of the first version —
re-unpacks per query tile — for A/B and as a fallback when Q is too
large for the accumulator scratch.)

Bit order: the in-kernel unpack (little-endian int32 words, LSB-first)
reproduces `ops.match.unpack_bits`' OpenCV byte order exactly — bit
index = 8*byte + bit = 32*word + bit-in-word — so distances are
bit-identical to the XLA path (property-tested in
tests/test_pallas_match.py).

The kernel carries rowdist = popcount(db) - 2*(q.db) instead of the full
Hamming distance: per query row the popcount(q) term is constant, so
argmin/top-2 order is unchanged, and the wrapper adds it back at the
end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cubesat_apds_tpu.core.config import DESC_BITS_PADDED

_WORDS = DESC_BITS_PADDED // 32          # 16 int32 words per descriptor
_BIG = jnp.int32(1 << 29)                # invalid-rowdist threshold
# Invalid rows carry vpop = _BIG + 1024 so rowdist = vpop − 2·dot stays
# ≥ _BIG for any dot ∈ [0, 512] while valid rowdist is ≤ 512.
_VPOP_INVALID = (1 << 29) + 1024
# NB: no module-level jnp scalar constants here — a device constant
# traced under one shard_map Manual mesh caches that mesh in its aval
# and poisons later traces under a different mesh; kernels and wrapper
# build their sentinels locally (3.0e38 matches ops.match._INVALID_DIST).


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


def _unpack_block(words, block_m):
    """[16, BM] int32 words → [512, BM] {0,1} bits (OpenCV bit order:
    bit b of little-endian word w is descriptor bit 32*w + b)."""
    shifts = jax.lax.broadcasted_iota(jnp.int32, (_WORDS, 32, 1), 1)
    bits = ((words[:, None, :] >> shifts) & 1)           # [16, 32, BM]
    return bits.reshape(DESC_BITS_PADDED, block_m)


def _mxu_dot(q, bits_t, mxu_dtype):
    if mxu_dtype == jnp.int8:
        return jax.lax.dot_general(
            q, bits_t.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    # bf16 fallback: products are 0/1 and the f32 accumulation is
    # exact for sums <= 512, so distances stay bit-identical.
    return jax.lax.dot_general(
        q.astype(mxu_dtype), bits_t.astype(mxu_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _merge_acc(acc, bd0, bd1, bi_g):
    """Fold one block's (best, second, best-index) into the running
    [TQ, 3] accumulator columns, preserving lowest-global-index
    tie-breaks (OpenCV semantics)."""
    s0 = acc[:, 0:1]
    s1 = acc[:, 1:2]
    si = acc[:, 2:3]
    better = (bd0 < s0) | ((bd0 == s0) & (bi_g < si))
    n0 = jnp.where(better, bd0, s0)
    ni = jnp.where(better, bi_g, si)
    loser = jnp.where(better, s0, bd0)
    n1 = jnp.minimum(jnp.minimum(s1, bd1), loser)
    c = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    return jnp.where(c == 0, n0, jnp.where(c == 1, n1,
                     jnp.where(c == 2, ni, 0)))


def _kernel_sweep(q_ref, dbw_ref, vpop_ref, out_ref, acc_ref, bits_ref, *,
                  block_m: int, mxu_dtype):
    """DB-block-outer variant: grid = (M/BM, Q/TQ).

    The bit-unpack runs once per DB block (amortized over every query
    tile) and the packed DB streams from HBM exactly once per pass.
    Reduction is keyed: key = (rowdist+512)<<13 | col packs the
    within-block tie-break into one min pass (needs BM ≤ 8192)."""
    j = pl.program_id(0)          # DB block (outer)
    i = pl.program_id(1)          # query tile (inner)
    nm = pl.num_programs(0)
    big = jnp.int32(1 << 29)
    key_max = jnp.int32(2**31 - 1)

    @pl.when(j == 0)
    def _init():
        acc_ref[i] = jnp.where(
            jax.lax.broadcasted_iota(
                jnp.int32, acc_ref.shape[1:], 1) < 2, big, 0)

    @pl.when(i == 0)
    def _unpack():
        bits_ref[:, :] = _unpack_block(
            dbw_ref[0], block_m).astype(jnp.int8)

    dot = _mxu_dot(q_ref[:, :], bits_ref[:, :], mxu_dtype)   # [TQ, BM]
    rowdist = vpop_ref[0, 0:1, :] - 2 * dot   # invalid rows ≥ big

    col = jax.lax.broadcasted_iota(jnp.int32, rowdist.shape, 1)
    keys = jnp.where(rowdist < jnp.int32(1 << 28),
                     ((rowdist + 512) << 13) | col, key_max)
    k0 = jnp.min(keys, axis=1, keepdims=True)                # [TQ, 1]
    bi = k0 & jnp.int32(8191)
    bd0 = jnp.where(k0 == key_max, big, (k0 >> 13) - 512)
    # Second best: exclude only the winning column (equal distances at
    # other indices remain eligible).
    k1 = jnp.min(jnp.where(col == bi, key_max, keys), axis=1,
                 keepdims=True)
    bd1 = jnp.where(k1 == key_max, big, (k1 >> 13) - 512)
    bi_g = jnp.where(bd0 >= big, 0, jnp.int32(block_m) * j + bi)

    new = _merge_acc(acc_ref[i], bd0, bd1, bi_g)
    acc_ref[i] = new

    @pl.when(j == nm - 1)
    def _emit():
        out_ref[:, :] = new


def _kernel_tile(q_ref, dbw_ref, vpop_ref, out_ref, acc_ref, *,
                 block_m: int, mxu_dtype):
    """Query-tile-outer variant: grid = (Q/TQ, M/BM).

    Re-unpacks each DB block once per query tile; the accumulator is a
    single [TQ, 3] scratch so Q is unbounded. Kept for A/B and as the
    fallback when Q exceeds the sweep variant's accumulator budget."""
    j = pl.program_id(1)
    nm = pl.num_programs(1)
    big = jnp.int32(1 << 29)

    @pl.when(j == 0)
    def _init():
        acc_ref[:, :] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 1) < 2,
            big, 0)

    bits_t = _unpack_block(dbw_ref[0], block_m)
    dot = _mxu_dot(q_ref[:, :], bits_t, mxu_dtype)
    rowdist = vpop_ref[0, 0:1, :] - 2 * dot   # invalid rows ≥ big

    col = jax.lax.broadcasted_iota(jnp.int32, rowdist.shape, 1)
    bd0 = jnp.min(rowdist, axis=1, keepdims=True)            # [TQ, 1]
    # First column index achieving the min = OpenCV lowest-index
    # tie-break within the block.
    bi = jnp.min(jnp.where(rowdist == bd0, col, jnp.int32(2 ** 30)),
                 axis=1, keepdims=True)
    bd1 = jnp.min(jnp.where(col == bi, big, rowdist), axis=1,
                  keepdims=True)
    bi_g = jnp.int32(block_m) * j + bi
    bi_g = jnp.where(bd0 >= big, 0, bi_g)

    new = _merge_acc(acc_ref[:, :], bd0, bd1, bi_g)
    acc_ref[:, :] = new

    @pl.when(j == nm - 1)
    def _emit():
        out_ref[:, :] = new


def layout_db_blocks(db_words, db_valid=None, *, db_block: int = 4096):
    """Pre-compute the kernel's DB layout: ([nm, 16, BM] int32 word
    blocks, [nm, 1, BM] int32 vpop plane — popcount(row) for valid rows,
    a huge sentinel for invalid/padding rows). Serving paths call this
    ONCE per DB so repeated queries skip the repack/transpose."""
    db_words = jnp.asarray(db_words, jnp.int32)
    m = db_words.shape[0]
    assert db_words.shape[1] == _WORDS, db_words.shape
    popdb = jnp.sum(_popcount32(db_words), axis=1, dtype=jnp.int32)
    if db_valid is not None:
        popdb = jnp.where(jnp.asarray(db_valid), popdb,
                          jnp.int32(_VPOP_INVALID))
    m_pad = (-m) % db_block
    if m_pad:
        db_words = jnp.pad(db_words, ((0, m_pad), (0, 0)))
        popdb = jnp.pad(popdb, (0, m_pad),
                        constant_values=_VPOP_INVALID)
    nm = (m + m_pad) // db_block
    dbw_t = db_words.reshape(nm, db_block, _WORDS).transpose(0, 2, 1)
    # [nm, 1, BM]: the unit middle axis keeps the last-two block dims
    # equal to the array dims (a Mosaic block-shape requirement).
    return dbw_t, popdb.reshape(nm, 1, db_block)


# Past this many padded queries the sweep variant's [nq, TQ, 128]
# accumulator scratch would crowd VMEM; fall back to the tile variant.
_SWEEP_MAX_Q = 16384
# The sweep kernel materializes TWO [TQ, BM] int32 planes (rowdist +
# keyed reduction) in VMEM; past 2^20 elements (8 MB for the pair) the
# Mosaic compiler runs out of VMEM (measured on v5e: qt=512/bm=4096 and
# qt=256/bm=8192 both fail to compile; qt=256/bm=4096 — the default and
# the fastest measured point, 216 G cmp/s — fits). Auto falls back to
# the tile variant (one plane, three-pass min) above this product.
_SWEEP_MAX_TILE_ELEMS = 1 << 20


@functools.partial(jax.jit, static_argnames=(
    "q_tile", "db_block", "mxu", "variant", "interpret"))
def knn2_fused(q_bits, db_words, db_valid=None, *, q_tile: int = 256,
               db_block: int = 4096, mxu: str = "int8",
               variant: str = "auto", interpret: bool = False):
    """Fused-kernel (d0, d1, i0): drop-in for `ops.match.knn2` semantics.

    q_bits:   int8 {0,1} [Q, 512] unpacked query bits.
    db_words: int32 [M, 16] packed words (`pack_words`), little-endian —
              OR a pre-laid-out (blocks, vpop) pair from
              `layout_db_blocks` (then db_valid must be None).
    db_valid: optional bool [M]; invalid rows never match.
    variant:  "sweep" (DB-block-outer, unpack amortized — default on
              the auto path), "tile" (query-outer), "auto".

    Returns (d0 f32 [Q], d1 f32 [Q], i0 int32 [Q]) with the same
    sentinel/tie-break semantics as knn2/knn2_blockwise.

    Defaults are the measured v5e operating point (sweep in
    benchmarks/exp_r3l_pallas_match.py; PERF.md "Large-DB matching").
    """
    q_bits = jnp.asarray(q_bits, jnp.int8)
    q, bwidth = q_bits.shape
    assert bwidth == DESC_BITS_PADDED, q_bits.shape

    if isinstance(db_words, tuple):
        assert db_valid is None, "validity is baked into the layout"
        dbw_t, vpop = db_words
        assert dbw_t.shape[1] == _WORDS and dbw_t.shape[2] == db_block
    else:
        dbw_t, vpop = layout_db_blocks(db_words, db_valid,
                                       db_block=db_block)
    nm = dbw_t.shape[0]

    q_pad = (-q) % q_tile
    if q_pad:
        q_bits = jnp.pad(q_bits, ((0, q_pad), (0, 0)))
    qp = q + q_pad
    nq = qp // q_tile

    if variant == "auto":
        variant = "sweep" if (qp <= _SWEEP_MAX_Q and db_block <= 8192
                              and q_tile * db_block
                              <= _SWEEP_MAX_TILE_ELEMS) else "tile"

    mxu_dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16,
                 "f32": jnp.float32}[mxu]

    if variant == "sweep":
        assert db_block <= 8192, "keyed reduction needs BM <= 8192"
        kern = functools.partial(_kernel_sweep, block_m=db_block,
                                 mxu_dtype=mxu_dtype)
        grid = (nm, nq)
        qmap = lambda j, i: (i, 0)          # noqa: E731
        dmap = lambda j, i: (j, 0, 0)       # noqa: E731
        scratch = [pltpu.VMEM((nq, q_tile, 128), jnp.int32),
                   pltpu.VMEM((DESC_BITS_PADDED, db_block), jnp.int8)]
    else:
        kern = functools.partial(_kernel_tile, block_m=db_block,
                                 mxu_dtype=mxu_dtype)
        grid = (nq, nm)
        qmap = lambda i, j: (i, 0)          # noqa: E731
        dmap = lambda i, j: (j, 0, 0)       # noqa: E731
        scratch = [pltpu.VMEM((q_tile, 128), jnp.int32)]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, DESC_BITS_PADDED), qmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _WORDS, db_block), dmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, db_block), dmap,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, 128), qmap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp, 128), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q_bits, dbw_t, vpop)

    out = out[:q]
    popq = jnp.sum(q_bits[:q].astype(jnp.int32), axis=-1)
    r0, r1, i0 = out[:, 0], out[:, 1], out[:, 2]
    # Python-literal constants, NOT the module-level jnp scalars: a
    # device constant traced under one shard_map Manual mesh carries
    # that mesh in its cached aval and poisons later traces under a
    # DIFFERENT mesh ("context mesh should match the aval mesh").
    big = 1 << 29
    invalid = jnp.float32(3.0e38)
    d0 = jnp.where(r0 >= big, invalid, (r0 + popq).astype(jnp.float32))
    d1 = jnp.where(r1 >= big, invalid, (r1 + popq).astype(jnp.float32))
    return d0, d1, i0
