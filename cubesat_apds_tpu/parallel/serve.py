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
from cubesat_apds_tpu.core.types import CameraModel, Correspondences, Matches
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
from cubesat_apds_tpu.ops.geometry.homography import find_homography_ransac
from cubesat_apds_tpu.ops.geometry.pnp import solve_pnp_ransac
from cubesat_apds_tpu.ops.match import knn2, matched_points, unpack_bits
from cubesat_apds_tpu.parallel.mesh import make_mesh  # noqa: F401 (re-export)
from cubesat_apds_tpu.pipelines.localize import DeviceDb


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
    )


def make_batch_localizer(mesh, camera: CameraModel,
                         config: PipelineConfig = PipelineConfig(),
                         solve_pose: Optional[bool] = None):
    """Build the jitted mesh-parallel batch step.

    Returns step(frames, db) -> (homography_result, pose_or_None,
    num_matches [B], num_keypoints [B]); frames [B, H, W] with B
    divisible by the dp axis; db from shard_device_db(mesh, ...).
    """

    @jax.jit
    def step(frames, db: DeviceDb):
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P("dp")))
        feats = jax.vmap(
            functools.partial(detect_and_compute, config=config.akaze))(frames)
        kp = feats.keypoints

        db_bits = unpack_bits(db.descriptors)
        db_bits = jax.lax.with_sharding_constraint(
            db_bits, NamedSharding(mesh, P("tp")))

        def match_one(desc, q_valid):
            q_bits = unpack_bits(desc)
            d0, d1, i0 = knn2(q_bits, db_bits, q_valid=q_valid,
                              db_valid=db.valid)
            good = (d0 < d1 * config.match.ratio) & (d0 < 3.0e38)
            return Matches(
                query_idx=jnp.arange(q_bits.shape[0], dtype=jnp.int32),
                train_idx=i0, distance=d0, valid=good)

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
                obj = db.obj_points[m.train_idx]
                w = m.valid.astype(jnp.float32)[:, None]
                centroid = jnp.sum(obj * w, axis=0) / \
                    jnp.maximum(jnp.sum(w), 1.0)
                corr = Correspondences(
                    obj_points=(obj - centroid).astype(jnp.float32),
                    img_points=kxy[m.query_idx],
                    valid=m.valid)
                sol = solve_pnp_ransac(corr, camera, config.pnp)
                from cubesat_apds_tpu.ops.geometry.rodrigues import (
                    rodrigues_to_matrix)
                tvec = sol.tvec - rodrigues_to_matrix(sol.rvec) @ \
                    centroid.astype(jnp.float32)
                return sol.rvec, tvec, sol.num_inliers, sol.ok

            pose = jax.vmap(pose_one)(kp.xy, matches)

        return homog, pose, matches.count(), kp.count()

    return step
