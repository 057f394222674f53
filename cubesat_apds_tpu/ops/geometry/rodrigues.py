"""Rodrigues rotation vector ↔ matrix (OpenCV cv::Rodrigues semantics)."""

from __future__ import annotations

import jax.numpy as jnp


def rodrigues_to_matrix(rvec):
    """[..., 3] rotation vector → [..., 3, 3] rotation matrix."""
    rvec = jnp.asarray(rvec)
    if not jnp.issubdtype(rvec.dtype, jnp.floating):
        rvec = rvec.astype(jnp.float32)
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = rvec / jnp.where(small, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    return jnp.where(small[..., None], eye, R)


def matrix_to_rodrigues(R):
    """[..., 3, 3] rotation matrix → [..., 3] rotation vector."""
    R = jnp.asarray(R)
    if not jnp.issubdtype(R.dtype, jnp.floating):
        R = R.astype(jnp.float32)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Off-diagonal antisymmetric part gives sin(θ)·axis.
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # Generic case.
    generic = v * (theta / jnp.where(jnp.abs(sin_theta) < 1e-8, 1.0, 2.0 * sin_theta))[..., None]
    # θ ≈ 0: rvec ≈ v/2.
    near_zero = v * 0.5
    # θ ≈ π: axis from diagonal of (R + I)/2 = aaᵀ.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag + 1.0) * 0.5, 0.0, None)
    axis_pi = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonals: sign(a_y) = sign(R01/a_x) etc. Choose the
    # largest component positive and derive the others.
    big = jnp.argmax(axis_sq, axis=-1)
    s01 = jnp.sign(R[..., 0, 1])
    s02 = jnp.sign(R[..., 0, 2])
    s12 = jnp.sign(R[..., 1, 2])
    def signs_for(b):
        return jnp.where(
            b == 0,
            jnp.stack([jnp.ones_like(s01), s01, s02], axis=-1),
            jnp.where(
                b == 1,
                jnp.stack([s01, jnp.ones_like(s01), s12], axis=-1),
                jnp.stack([s02, s12, jnp.ones_like(s01)], axis=-1),
            ),
        )
    axis_pi = axis_pi * signs_for(big[..., None] if big.ndim else big)
    near_pi = axis_pi * theta[..., None]
    small_angle = (jnp.abs(sin_theta) < 1e-6)[..., None]
    is_pi = (cos_theta < 0)[..., None]
    return jnp.where(small_angle, jnp.where(is_pi, near_pi, near_zero), generic)
