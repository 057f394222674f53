"""Camera model math: projection, Brown–Conrady distortion, undistortion.

The reference keeps intrinsics as raw OpenCV Mats and lets calib3d handle
projection (calibrator/src/main.rs:65-80; homographier mod.rs:320-369).
Here projection/distortion are explicit jittable functions, shared by PnP
reprojection scoring and calibration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.core.types import CameraModel


def distort_normalized(xy, dist):
    """Apply Brown–Conrady distortion (k1,k2,p1,p2,k3) to normalized coords.

    xy: [..., 2] normalized image coordinates (x/z, y/z).
    """
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    x_t = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    y_t = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + x_t, y * radial + y_t], axis=-1)


def undistort_normalized(xy, dist, iters: int = 8):
    """Invert distortion by fixed-point iteration (OpenCV undistortPoints style)."""

    def body(_, pts):
        d = distort_normalized(pts, dist) - pts
        return xy - d

    return jax.lax.fori_loop(0, iters, body, xy)


def project_points(obj_points, rvec, tvec, K, dist=None):
    """World points → pixel coordinates (OpenCV projectPoints semantics).

    obj_points: [..., N, 3]; rvec/tvec: [..., 3]; K: [3,3]; dist: [5] or None.
    Returns pixels [..., N, 2] and camera-frame depth z [..., N].
    """
    from cubesat_apds_tpu.ops.geometry.rodrigues import rodrigues_to_matrix

    R = rodrigues_to_matrix(rvec)  # [..., 3, 3]
    cam = jnp.einsum("...ij,...nj->...ni", R, obj_points) + tvec[..., None, :]
    z = cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xy_n = cam[..., :2] / safe_z[..., None]
    if dist is not None:
        xy_n = distort_normalized(xy_n, dist)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    skew = K[..., 0, 1]
    u = fx[..., None] * xy_n[..., 0] + skew[..., None] * xy_n[..., 1] + cx[..., None]
    v = fy[..., None] * xy_n[..., 1] + cy[..., None]
    return jnp.stack([u, v], axis=-1), z


def pixels_to_normalized(pix, camera: CameraModel, undistort: bool = True):
    """Pixel coords → normalized coords, removing distortion."""
    K = camera.K
    fx, fy = K[0, 0], K[1, 1]
    cx, cy, skew = K[0, 2], K[1, 2], K[0, 1]
    y = (pix[..., 1] - cy) / fy
    x = (pix[..., 0] - cx - skew * y) / fx
    xy = jnp.stack([x, y], axis=-1)
    if undistort:
        xy = undistort_normalized(xy, camera.dist)
    return xy


def undistort_image_grid(shape_hw, camera: CameraModel):
    """Build the sampling grid that undistorts a full image.

    Returns [H, W, 2] source pixel coordinates: for each output pixel,
    where to sample in the distorted input (use with ops.warp.bilinear_sample).
    """
    h, w = shape_hw
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([gx, gy], axis=-1)
    K = camera.K
    fx, fy = K[0, 0], K[1, 1]
    cx, cy, skew = K[0, 2], K[1, 2], K[0, 1]
    yn = (pix[..., 1] - cy) / fy
    xn = (pix[..., 0] - cx - skew * yn) / fx
    xyd = distort_normalized(jnp.stack([xn, yn], axis=-1), camera.dist)
    u = fx * xyd[..., 0] + skew * xyd[..., 1] + cx
    v = fy * xyd[..., 1] + cy
    return jnp.stack([u, v], axis=-1)
