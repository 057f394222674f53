"""Typed pytree containers for the pipeline.

Design: everything downstream of detection is *fixed capacity + validity
mask* so jit sees static shapes (SURVEY.md §7 "hard parts" #3). The
reference's keypoint record layout (x, y, size, angle, response, octave,
class_id, descriptor bytes) follows `DbKeypoints`
(reference: feature_extraction/src/lib.rs:21-31); the pose solution mirrors
`PNPRANSACSolution {rvec, tvec, inliers}`
(reference: homographier/src/homographier/mod.rs:46-51).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def _pytree(cls):
    """Register a dataclass as a JAX pytree (all fields are children)."""
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree
@dataclasses.dataclass
class Keypoints:
    """Fixed-capacity keypoint set.

    All arrays share leading dims ``[..., K]`` where K is the static
    capacity; ``valid`` masks the live entries. Invalid slots hold zeros
    and must be ignored by consumers (response-sorted so that valid
    entries are a prefix when produced by the detector).
    """

    xy: jax.Array          # [..., K, 2] float32 — (x, y) pixel coords
    size: jax.Array        # [..., K]   float32 — diameter (OpenCV convention)
    angle: jax.Array       # [..., K]   float32 — orientation, radians
    response: jax.Array    # [..., K]   float32 — detector response
    octave: jax.Array      # [..., K]   int32
    class_id: jax.Array    # [..., K]   int32
    valid: jax.Array       # [..., K]   bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int, batch_shape: tuple = ()) -> "Keypoints":
        bs = tuple(batch_shape)
        return Keypoints(
            xy=jnp.zeros(bs + (capacity, 2), jnp.float32),
            size=jnp.zeros(bs + (capacity,), jnp.float32),
            angle=jnp.zeros(bs + (capacity,), jnp.float32),
            response=jnp.zeros(bs + (capacity,), jnp.float32),
            octave=jnp.zeros(bs + (capacity,), jnp.int32),
            class_id=jnp.full(bs + (capacity,), -1, jnp.int32),
            valid=jnp.zeros(bs + (capacity,), bool),
        )


@_pytree
@dataclasses.dataclass
class Features:
    """Keypoints + their binary descriptors.

    ``descriptors`` is the packed MLDB bit-string: uint8 ``[..., K, 61]``
    (486 bits — reference: feature_extraction/src/lib.rs:64-73 uses
    DESCRIPTOR_MLDB, full size, 3 channels).
    """

    keypoints: Keypoints
    descriptors: jax.Array  # [..., K, DESC_BYTES] uint8 (packed bits)

    @property
    def capacity(self) -> int:
        return self.keypoints.capacity


@_pytree
@dataclasses.dataclass
class Matches:
    """Fixed-capacity match set (query index, train index, distance).

    Mirrors OpenCV DMatch {query_idx, train_idx, distance} as consumed at
    reference: feature_extraction/src/lib.rs:94-126 — but stored struct-of-
    arrays with a validity mask so jit shapes stay static.
    """

    query_idx: jax.Array  # [..., M] int32
    train_idx: jax.Array  # [..., M] int32
    distance: jax.Array   # [..., M] float32
    valid: jax.Array      # [..., M] bool

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


@_pytree
@dataclasses.dataclass
class Correspondences:
    """3D↔2D correspondences for PnP.

    Mirrors ``ImgObjCorrespondence {obj_point: Point3d, img_point: Point2d}``
    (reference: homographier/src/homographier/mod.rs:52-65), batched.
    """

    obj_points: jax.Array  # [..., N, 3] float32 (world / ECEF)
    img_points: jax.Array  # [..., N, 2] float32 (pixels)
    valid: jax.Array       # [..., N] bool


@_pytree
@dataclasses.dataclass
class HomographyResult:
    """3×3 homography + inlier mask, as from ``find_homography_mat``
    (reference: homographier/src/homographier/mod.rs:231-259)."""

    H: jax.Array            # [..., 3, 3] float32
    inliers: jax.Array      # [..., N] bool — inlier mask over input corr.
    num_inliers: jax.Array  # [...] int32
    ok: jax.Array           # [...] bool — solution found


@_pytree
@dataclasses.dataclass
class PoseSolution:
    """6-DoF pose: Rodrigues rotation vector + translation + inlier mask.

    Mirrors ``PNPRANSACSolution`` (reference: homographier mod.rs:46-51).
    """

    rvec: jax.Array         # [..., 3] float32
    tvec: jax.Array         # [..., 3] float32
    inliers: jax.Array      # [..., N] bool
    num_inliers: jax.Array  # [...] int32
    ok: jax.Array           # [...] bool


@_pytree
@dataclasses.dataclass
class CameraModel:
    """Pinhole intrinsics + Brown–Conrady distortion (k1,k2,p1,p2,k3).

    The reference carries OpenCV's `Mat` K + dist_coeffs
    (calibrator/src/main.rs:65-80); here it is a typed pytree usable
    inside jit.
    """

    K: jax.Array     # [3, 3] float32
    dist: jax.Array  # [5] float32 — k1, k2, p1, p2, k3

    @staticmethod
    def ideal(fx: float, fy: float, cx: float, cy: float) -> "CameraModel":
        K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)
        return CameraModel(K=K, dist=jnp.zeros(5, jnp.float32))
