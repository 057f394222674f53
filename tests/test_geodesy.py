"""Geotransform + WGS84/ECEF tests (replaces GDAL CoordTransform parity,
reference: feature_database/src/elevationdb.rs:64-104)."""

import numpy as np
import pytest

from cubesat_apds_tpu.core import geodesy as G


GT = np.array([100.0, 0.5, 0.0, 50.0, 0.0, -0.5])  # typical north-up raster


def test_geotransform_roundtrip():
    wx, wy = G.geotransform_apply(GT, 10.0, 20.0)
    assert float(wx) == pytest.approx(105.0)
    assert float(wy) == pytest.approx(40.0)
    px, py = G.world_to_pixel(GT, wx, wy)
    assert float(px) == pytest.approx(10.0, abs=1e-9)
    assert float(py) == pytest.approx(20.0, abs=1e-9)


def test_geotransform_with_rotation_roundtrip(rng):
    gt = np.array([12.0, 0.3, 0.1, -7.0, -0.05, 0.4])
    px, py = rng.uniform(0, 1000, 2)
    wx, wy = G.geotransform_apply(gt, px, py)
    px2, py2 = G.world_to_pixel(gt, wx, wy)
    assert float(px2) == pytest.approx(px, abs=1e-8)
    assert float(py2) == pytest.approx(py, abs=1e-8)


def test_ecef_known_points():
    # Equator / prime meridian, h=0 → (a, 0, 0).
    xyz = np.asarray(G.geodetic_to_ecef(0.0, 0.0, 0.0))
    np.testing.assert_allclose(xyz, [G.WGS84_A, 0.0, 0.0], atol=1e-6)
    # North pole, h=0 → z = a(1−e²)/sqrt(1−e²) = b (semi-minor ≈ 6356752.3142).
    xyz = np.asarray(G.geodetic_to_ecef(0.0, 90.0, 0.0))
    np.testing.assert_allclose(xyz[2], 6356752.314245, atol=1e-3)
    np.testing.assert_allclose(xyz[:2], 0.0, atol=1e-3)
    # 90°E on the equator → y = a.
    xyz = np.asarray(G.geodetic_to_ecef(90.0, 0.0, 0.0))
    np.testing.assert_allclose(xyz[1], G.WGS84_A, atol=1e-6)


def test_ecef_roundtrip(rng):
    lon = rng.uniform(-179, 179, 16)
    lat = rng.uniform(-89, 89, 16)
    h = rng.uniform(-100, 9000, 16)
    xyz = G.geodetic_to_ecef(lon, lat, h)
    lon2, lat2, h2 = G.ecef_to_geodetic(xyz)
    np.testing.assert_allclose(np.asarray(lon2), lon, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lat2), lat, atol=1e-7)
    np.testing.assert_allclose(np.asarray(h2), h, atol=1e-4)


def test_himmelbjerget_height_plausible():
    # The reference's elevation golden is ≈147 m at Himmelbjerget
    # (geotiff mod.rs:683,718): check our ECEF magnitude is consistent
    # with a point at that elevation (|xyz| between a·(1−f) and a + h).
    xyz = np.asarray(G.geodetic_to_ecef(9.68, 56.1, 147.0))
    r = np.linalg.norm(xyz)
    assert 6356752.0 < r < G.WGS84_A + 200.0


# ---- attitude outputs (core/attitude.py) -----------------------------


def test_quaternion_matrix_roundtrip(rng):
    """rotation → quaternion → rotation is the identity for random
    rotations, including near-180° ones where the naive trace formula's
    pivot vanishes (Shepperd anchor selection)."""
    from cubesat_apds_tpu.core.attitude import (
        quaternion_to_matrix, rotation_to_quaternion)
    from cubesat_apds_tpu.ops.geometry.rodrigues import rodrigues_to_matrix

    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = np.concatenate([rng.uniform(0, np.pi, 60),
                             [np.pi - 1e-7, np.pi - 1e-4, 1e-8, 0.0]])
    rvecs = (axes * angles[:, None]).astype(np.float32)
    R = np.asarray(rodrigues_to_matrix(rvecs), np.float64)
    q = rotation_to_quaternion(R)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0,
                               atol=1e-12)
    assert (q[:, 0] >= 0).all()            # sign-normalized
    np.testing.assert_allclose(quaternion_to_matrix(q), R, atol=1e-6)


def test_euler_zyx_known_values():
    from cubesat_apds_tpu.core.attitude import (
        matrix_to_euler_zyx, quaternion_to_matrix)

    # Pure yaw 90°.
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    np.testing.assert_allclose(matrix_to_euler_zyx(Rz),
                               [np.pi / 2, 0, 0], atol=1e-12)
    # Gimbal lock (pitch = +90°) folds roll into yaw, roll = 0.
    Ry = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float64)
    e = matrix_to_euler_zyx(Ry)
    np.testing.assert_allclose(e, [0, np.pi / 2, 0], atol=1e-9)
    # Quaternion identity.
    np.testing.assert_allclose(
        quaternion_to_matrix(np.array([1.0, 0, 0, 0])), np.eye(3),
        atol=1e-15)


def test_pose_to_attitude_camera_center(rng):
    """−Rᵀt recovers the camera center used to build the pose, and the
    attitude quaternion is the camera→world rotation."""
    from cubesat_apds_tpu.core.attitude import (
        pose_to_attitude, quaternion_to_matrix)
    from cubesat_apds_tpu.ops.geometry.rodrigues import rodrigues_to_matrix

    rvec = np.array([0.2, -0.4, 0.9], np.float32)
    center = np.array([100.0, -50.0, 2000.0])
    R = np.asarray(rodrigues_to_matrix(rvec), np.float64)
    tvec = -R @ center                    # x_cam = R(X − C) = RX + t
    att = pose_to_attitude(rvec, tvec)
    np.testing.assert_allclose(att["position"], center, atol=1e-3)
    np.testing.assert_allclose(quaternion_to_matrix(att["quat_wxyz"]),
                               R.T, atol=1e-6)
    assert att["euler_zyx_deg"].shape == (3,)
