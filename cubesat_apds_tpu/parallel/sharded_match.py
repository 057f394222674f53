"""Descriptor-DB tensor parallelism: shard_map Hamming matching.

The multi-chip analogue of ops.match for DBs beyond one chip's HBM
(BASELINE.json config 4, SURVEY.md §2.3 "TP" row): the DB axis is sharded
over the mesh's "tp" axis; every chip computes a local top-2 against its
shard with the MXU popcount-matmul, then the [tp, Q]-sized partials are
all-gathered over ICI and merged — communication is O(Q·tp), never O(M).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cubesat_apds_tpu.core.types import Matches
from cubesat_apds_tpu.ops import match as M


def _local_then_merge(q_bits, db_bits_local, db_valid_local, axis: str):
    """Per-shard top-2 + cross-shard merge (runs inside shard_map)."""
    d0, d1, i0 = M.knn2(q_bits, db_bits_local, db_valid=db_valid_local)
    return _merge_partials(d0, d1, i0, db_bits_local.shape[0], axis)


def _merge_partials(d0, d1, i0, shard_m: int, axis: str):
    """Cross-shard top-2 merge of per-shard partials (inside shard_map)."""
    idx = jax.lax.axis_index(axis)
    i0_global = i0 + idx * shard_m

    # Gather the [Q] partials from every shard: [S, Q].
    d0_all = jax.lax.all_gather(d0, axis)
    d1_all = jax.lax.all_gather(d1, axis)
    i0_all = jax.lax.all_gather(i0_global, axis)

    # Best across shards with lowest-global-index tie-break. int32 keys
    # (d ≤ 512): invalid shards carry the 3e38 float sentinel — map it to
    # int32-max BEFORE the integer conversion.
    # Max key = 512·m_total + (m_total−1) = 513·m_total − 1.
    m_total = shard_m * jax.lax.axis_size(axis)
    assert 513 * m_total <= 2**31, \
        "merge keys overflow int32 beyond ~4.18M total rows"
    invalid = d0_all >= jnp.float32(3.0e38)
    d_i = jnp.where(invalid, 0, d0_all).astype(jnp.int32)
    key = d_i * m_total + i0_all.astype(jnp.int32)
    key = jnp.where(invalid, jnp.int32(2**31 - 1), key)
    best_shard = jnp.argmin(key, axis=0)
    q_idx = jnp.arange(d0.shape[0])
    best_d0 = d0_all[best_shard, q_idx]
    best_i0 = i0_all[best_shard, q_idx]
    # Second best: min over (all d1) and (d0 of non-winning shards).
    d0_masked = jnp.where(
        jnp.arange(d0_all.shape[0])[:, None] == best_shard[None, :],
        jnp.float32(3.0e38), d0_all)
    best_d1 = jnp.minimum(jnp.min(d1_all, axis=0), jnp.min(d0_masked, axis=0))
    return best_d0, best_d1, best_i0


def make_sharded_knn2(mesh: Mesh, axis: str = "tp"):
    """Build a jitted sharded top-2 search: (q_bits, db_bits, db_valid) →
    (d0, d1, i0) with db sharded over `axis` and queries replicated."""

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        # Outputs are replicated by construction (derived from the
        # all_gathered partials); the static VMA check can't prove it.
        check_vma=False,
    )
    def sharded(q_bits, db_bits, db_valid):
        return _local_then_merge(q_bits, db_bits, db_valid, axis)

    return sharded


def make_sharded_knn2_blockwise(mesh: Mesh, block: int = 65536,
                                axis: str = "tp"):
    """Production-scale sharded top-2: the DB stays PACKED ([M, 61]
    uint8, 61 B/descriptor in HBM) and sharded over `axis`; each chip
    streams its shard through knn2_blockwise (per-block unpack on the
    MXU), then partials merge over ICI — blockwise-inside-each-shard,
    exactly the BASELINE config-4 shape at multi-chip scale."""

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded(q_bits, db_packed_local, db_valid_local):
        d0, d1, i0 = M.knn2_blockwise(q_bits, db_packed_local, block,
                                      db_valid_local)
        return _merge_partials(d0, d1, i0, db_packed_local.shape[0], axis)

    return sharded


def make_sharded_knn2_fused(mesh: Mesh, db_block: int = 4096,
                            axis: str = "tp"):
    """Sharded top-2 with the fused Pallas kNN-2 kernel per shard
    (ops/pallas/match_kernel.py): the DB stays PACKED and sharded over
    `axis`, each chip sweeps its shard with the VMEM-resident fused
    matmul+top-2 kernel (~5× the XLA scan, bit-identical), partials
    merge over ICI. Off-TPU (the CPU test mesh) the kernel runs in
    interpreter mode — same program, same results."""
    interpret = jax.devices()[0].platform != "tpu"

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded(q_bits, db_packed_local, db_valid_local):
        from cubesat_apds_tpu.ops.pallas.match_kernel import (
            knn2_fused, pack_words)
        d0, d1, i0 = knn2_fused(
            q_bits.astype(jnp.int8), pack_words(db_packed_local),
            db_valid_local, db_block=db_block, interpret=interpret)
        return _merge_partials(d0, d1, i0, db_packed_local.shape[0], axis)

    return sharded


def sharded_knn_match(mesh: Mesh, q_desc_packed, db_desc_packed,
                      ratio: float = 0.3, q_valid=None, db_valid=None,
                      axis: str = "tp") -> Matches:
    """Mesh-parallel get_knn_matches (reference semantics, lib.rs:94-114).

    db_desc_packed's leading dim must divide by the axis size; pad with
    db_valid=False entries (store.export_device_block handles this).
    """
    qb = M.unpack_bits(q_desc_packed)
    db = M.unpack_bits(db_desc_packed)
    if db_valid is None:
        db_valid = jnp.ones(db.shape[0], bool)
    fn = make_sharded_knn2(mesh, axis)
    d0, d1, i0 = fn(qb, db, db_valid)
    invalid = jnp.float32(3.0e38)
    if q_valid is not None:
        d0 = jnp.where(q_valid, d0, invalid)
    good = (d0 < d1 * ratio) & (d0 < invalid)
    return Matches(
        query_idx=jnp.arange(qb.shape[0], dtype=jnp.int32),
        train_idx=i0,
        distance=d0,
        valid=good,
    )
