"""Binary (mmap + native C++) store tests: equivalence with the in-memory
FeatureStore query semantics."""

import numpy as np
import pytest

from cubesat_apds_tpu.core.config import DESC_BYTES
from cubesat_apds_tpu.store.binary_store import (
    BinaryFeatureStore,
    write_binary_store,
)
from cubesat_apds_tpu.store.feature_store import FeatureStore
from cubesat_apds_tpu.store.native import get_lib


def _build_store(rng, n_imgs=3, n_per=200):
    store = FeatureStore()
    for k in range(n_imgs):
        lod = k % 2
        iid = store.create_image(0, 0, 1000, 1000, lod)
        x = rng.uniform(0, 1000, n_per).astype(np.float32)
        y = rng.uniform(0, 1000, n_per).astype(np.float32)
        store.add_keypoints(
            iid, x, y,
            size=np.full(n_per, 4.8, np.float32),
            angle=rng.uniform(0, 6.28, n_per).astype(np.float32),
            response=rng.uniform(0, 1, n_per).astype(np.float32),
            octave=np.zeros(n_per, np.int32),
            class_id=np.zeros(n_per, np.int32),
            descriptors=rng.integers(0, 256, (n_per, DESC_BYTES),
                                     dtype=np.uint8),
        )
    return store


def test_native_lib_compiles():
    # The toolchain is part of the environment contract; the native
    # engine must actually build here.
    assert get_lib() is not None


def test_binary_roundtrip_lod_query(rng, tmp_path):
    store = _build_store(rng)
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    assert len(b) == len(store)
    for lod in (0, 1):
        c_ref, d_ref = store.read_keypoints_from_lod(lod)
        c_bin, d_bin = b.read_keypoints_from_lod(lod)
        np.testing.assert_array_equal(d_ref, d_bin)
        np.testing.assert_allclose(c_ref["response"], c_bin["response"])
        # response DESC ordering preserved
        assert (np.diff(c_bin["response"]) <= 0).all()


def test_binary_window_query_equivalence(rng, tmp_path):
    store = _build_store(rng)
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    c_ref, d_ref = store.read_keypoints_from_coordinates(
        100, 400, 200, 600, 0)
    c_bin, d_bin = b.read_keypoints_from_coordinates(100, 400, 200, 600, 0)
    np.testing.assert_array_equal(d_ref, d_bin)
    np.testing.assert_allclose(c_ref["x"], c_bin["x"])


def test_binary_limit_semantics(rng, tmp_path):
    store = _build_store(rng)
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    c, d = b.read_keypoints_from_lod(0, limit=50)
    assert len(d) == 50
    c_all, _ = b.read_keypoints_from_lod(0)
    np.testing.assert_allclose(c["response"], c_all["response"][:50])


def test_binary_image_query(rng, tmp_path):
    store = _build_store(rng)
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    c, d = b.read_keypoints_from_image_id(1)
    assert (c["image_id"] == 1).all()
    assert len(d) == 200


def test_binary_device_export(rng, tmp_path):
    store = _build_store(rng)
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    desc, xy, valid, img = b.export_device_block(lod=0, pad_multiple=128)
    assert desc.shape[0] % 128 == 0
    ref = store.export_device_block(lod=0, pad_multiple=128)
    np.testing.assert_array_equal(desc, ref[0])
    np.testing.assert_allclose(xy, ref[1])


def test_numpy_fallback_equivalence(rng, tmp_path, monkeypatch):
    """Force the no-toolchain path and check identical results."""
    store = _build_store(rng)
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    b._lib = None
    c_ref, d_ref = store.read_keypoints_from_coordinates(0, 500, 0, 500, 1)
    c_bin, d_bin = b.read_keypoints_from_coordinates(0, 500, 0, 500, 1)
    np.testing.assert_array_equal(d_ref, d_bin)
