"""Mesh-parallel batched serving: the full online localization step
(detect → match → homography → PnP) over a (dp × tp) device mesh.

The reference scales with a rayon thread pool on one host (SURVEY.md
§2.3); the TPU-native scaling model runs the SAME jitted pipeline over a
jax.sharding.Mesh:

  * frames shard over "dp" — each dp row processes its own frames'
    AKAZE scale spaces (pure data parallelism, zero communication);
  * the descriptor DB shards over "tp" — the Hamming-distance matmul
    runs on each chip's DB shard and XLA inserts the cross-shard top-2
    merge collectives (GSPMD; the explicit shard_map variant lives in
    parallel.sharded_match);
  * geometry (RANSAC homography + PnP) is per-frame work on the dp rows.

Use: build once with make_batch_localizer, then call with [B, H, W]
frame batches (B divisible by dp). The driver's dryrun_multichip
exercises this end-to-end on a virtual mesh every round.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cubesat_apds_tpu.core.config import PipelineConfig
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute_batch
from cubesat_apds_tpu.ops.geometry.homography import find_homography_ransac
from cubesat_apds_tpu.ops.match import (
    knn_match_bits, matched_points, unpack_bits)
from cubesat_apds_tpu.parallel.mesh import make_mesh  # noqa: F401 (re-export)
from cubesat_apds_tpu.pipelines.localize import (
    DeviceDb, solve_pose_recentered)


def shard_device_db(mesh, db: DeviceDb, pad_to_multiple: bool = True
                    ) -> DeviceDb:
    """Place a DeviceDb on the mesh: descriptors/valid sharded over tp
    (rows padded to a tp multiple with valid=False), xy/obj replicated
    (the winner gather after the top-2 merge needs full coordinates)."""
    tp = mesh.shape["tp"]
    m = db.descriptors.shape[0]
    pad = (-m) % tp if pad_to_multiple else 0
    desc = db.descriptors
    valid = db.valid
    xy = db.xy
    obj = db.obj_points
    if pad:
        desc = jnp.concatenate(
            [desc, jnp.zeros((pad,) + desc.shape[1:], desc.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), xy.dtype)])
        obj = jnp.concatenate([obj, jnp.zeros((pad, 3), obj.dtype)])
    return DeviceDb(
        descriptors=jax.device_put(desc, NamedSharding(mesh, P("tp"))),
        xy=jax.device_put(xy, NamedSharding(mesh, P())),
        valid=jax.device_put(valid, NamedSharding(mesh, P("tp"))),
        obj_points=jax.device_put(obj, NamedSharding(mesh, P())),
        has_world=db.has_world,
        world_frame=db.world_frame,
    )


def _fused_match_step(mesh, config, q_desc, q_valid, db: DeviceDb):
    """Big-DB mesh match: per-chip fused Pallas kNN-2 over its PACKED
    tp shard (ops.pallas.match_kernel — the DB never unpacks to the 8×
    bit form in HBM) + the O(Q·tp) ICI top-2 merge, with the frame axis
    staying dp-sharded. All dp rows of one tp column flatten into ONE
    kernel launch per chip. Off-TPU the kernel runs in interpreter mode
    (CPU-mesh equivalence tests)."""
    from cubesat_apds_tpu.ops.match import _ratio_matches
    from cubesat_apds_tpu.ops.pallas.match_kernel import (
        knn2_fused, pack_words)
    from cubesat_apds_tpu.parallel.sharded_match import _merge_partials

    interpret = jax.devices()[0].platform != "tpu"
    _, q_cap, _ = q_desc.shape

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp"), P("tp"), P("tp")),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    def inner(qd, db_local, valid_local):
        lb = qd.shape[0]
        qb = unpack_bits(qd).reshape(lb * q_cap, -1).astype(jnp.int8)
        d0, d1, i0 = knn2_fused(qb, pack_words(db_local), valid_local,
                                interpret=interpret)
        d0, d1, i0 = _merge_partials(d0, d1, i0, db_local.shape[0], "tp")
        return (d0.reshape(lb, q_cap), d1.reshape(lb, q_cap),
                i0.reshape(lb, q_cap))

    d0, d1, i0 = inner(q_desc, db.descriptors, db.valid)
    d0 = jnp.where(q_valid, d0, jnp.float32(3.0e38))
    return jax.vmap(
        lambda a, b, c: _ratio_matches(a, b, c, config.match.ratio)
    )(d0, d1, i0)


def make_batch_localizer(mesh, camera: CameraModel,
                         config: PipelineConfig = PipelineConfig(),
                         solve_pose: Optional[bool] = None):
    """Build the jitted mesh-parallel batch step.

    Returns step(frames, db) -> (homography_result, pose_or_None,
    num_matches [B], num_keypoints [B]); frames [B, H, W] with B
    divisible by the dp axis; db from shard_device_db(mesh, ...).
    `pose` is a batched PoseSolution pytree (leaves lead with B).

    Matching: DBs whose per-chip shard stays big run the fused Pallas
    kNN-2 kernel per shard (packed, shard_map + ICI merge); small DBs
    take the GSPMD unpacked-matmul path. `config.match.kernel` forces
    either ("fused"/"scan").
    """

    @jax.jit
    def step(frames, db: DeviceDb):
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P("dp")))
        # Batched extraction with the batch-level capacity ladder (the
        # rung-index max is a cross-dp all-reduce under GSPMD; every
        # device then takes the same branch).
        feats = detect_and_compute_batch(frames, config.akaze)
        kp = feats.keypoints

        m_per_chip = max(db.descriptors.shape[0] // mesh.shape["tp"], 1)
        on_tpu = jax.devices()[0].platform == "tpu"
        use_fused = config.match.kernel == "fused" or (
            config.match.kernel == "auto" and on_tpu
            and m_per_chip > config.match.db_block)

        if use_fused:
            matches = _fused_match_step(mesh, config, feats.descriptors,
                                        kp.valid, db)
        else:
            db_bits = unpack_bits(db.descriptors)
            db_bits = jax.lax.with_sharding_constraint(
                db_bits, NamedSharding(mesh, P("tp")))

            # The tp-sharded DB cannot stream blockwise (dynamic slices
            # along the sharded axis gather across chips); memory is
            # bounded by chunking the replicated QUERY axis instead so
            # [q_block, M/tp] per-chip distance tiles honour db_block.
            q_block = max(
                (config.match.db_block * 2048) // m_per_chip, 128)

            def match_one(desc, q_valid):
                return knn_match_bits(
                    unpack_bits(desc), db_bits, ratio=config.match.ratio,
                    q_valid=q_valid, db_valid=db.valid, q_block=q_block)

            matches = jax.vmap(match_one)(feats.descriptors, kp.valid)

        def homog_one(kxy, m):
            q, t = matched_points(kxy, db.xy, m)
            return find_homography_ransac(q, t, valid=m.valid,
                                          config=config.ransac)

        homog = jax.vmap(homog_one)(kp.xy, matches)

        pose = None
        want_pose = db.has_world if solve_pose is None else solve_pose
        if want_pose:
            def pose_one(kxy, m):
                return solve_pose_recentered(
                    db.obj_points, kxy[m.query_idx], m, camera, config.pnp,
                    world_frame=db.world_frame)

            pose = jax.vmap(pose_one)(kp.xy, matches)

        return homog, pose, matches.count(), kp.count()

    return step
