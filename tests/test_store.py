"""FeatureStore semantics tests — mirror the reference's live-Postgres
integration tests (feature_database/src/imagedb.rs:108-339,
keypointdb.rs:139-667, elevationdb.rs:106-300), minus the database."""

import numpy as np
import pytest

from cubesat_apds_tpu.core.config import DESC_BYTES
from cubesat_apds_tpu.store.feature_store import FeatureStore


def _add_image_with_kps(store, rng, lod, n, bbox=(0, 0, 1000, 1000)):
    iid = store.create_image(bbox[0], bbox[1], bbox[2], bbox[3], lod)
    x = rng.uniform(bbox[0], bbox[2], n).astype(np.float32)
    y = rng.uniform(bbox[1], bbox[3], n).astype(np.float32)
    store.add_keypoints(
        iid, x, y,
        size=np.full(n, 4.8, np.float32),
        angle=rng.uniform(0, 6.28, n).astype(np.float32),
        response=rng.uniform(0, 1, n).astype(np.float32),
        octave=np.zeros(n, np.int32),
        class_id=np.zeros(n, np.int32),
        descriptors=rng.integers(0, 256, (n, DESC_BYTES), dtype=np.uint8),
    )
    return iid


def test_image_crud(rng):
    store = FeatureStore()
    iid = store.create_image(0, 0, 100, 100, 1)
    rec = store.read_image_from_id(iid)
    assert rec.x_end == 100 and rec.level_of_detail == 1
    assert len(store.find_images_from_lod(1)) == 1
    assert len(store.find_images_from_lod(2)) == 0
    store.delete_image(iid)
    assert len(store.find_images_from_lod(1)) == 0


def test_image_ids_are_serial(rng):
    store = FeatureStore()
    ids = [store.create_image(0, 0, 10, 10, 0) for _ in range(5)]
    assert ids == [1, 2, 3, 4, 5]


def test_find_images_from_dimensions_overlap(rng):
    store = FeatureStore()
    a = store.create_image(0, 0, 100, 100, 0)
    b = store.create_image(200, 200, 300, 300, 0)
    c = store.create_image(50, 50, 150, 150, 1)   # other LoD
    hits = store.find_images_from_dimensions(90, 210, 90, 210, 0)
    assert {r.id for r in hits} == {a, b}
    hits = store.find_images_from_dimensions(120, 180, 120, 180, 0)
    assert hits == []
    hits = store.find_images_from_dimensions(40, 60, 40, 60, 1)
    assert {r.id for r in hits} == {c}


def test_keypoints_response_desc_order(rng):
    store = FeatureStore()
    _add_image_with_kps(store, rng, lod=0, n=500)
    cols, desc = store.read_keypoints_from_lod(0)
    assert len(desc) == 500
    r = cols["response"]
    assert (np.diff(r) <= 0).all(), "must be response DESC"


def test_keypoints_limit_cap(rng):
    store = FeatureStore()
    _add_image_with_kps(store, rng, lod=0, n=300)
    cols, desc = store.read_keypoints_from_lod(0, limit=100)
    assert len(desc) == 100
    # The cap keeps the STRONGEST 100.
    all_cols, _ = store.read_keypoints_from_lod(0)
    assert cols["response"][0] == all_cols["response"][0]
    assert cols["response"][-1] >= np.median(all_cols["response"])


def test_spatial_window_query(rng):
    store = FeatureStore()
    _add_image_with_kps(store, rng, lod=0, n=400, bbox=(0, 0, 1000, 1000))
    cols, desc = store.read_keypoints_from_coordinates(100, 300, 100, 300, 0)
    assert len(desc) > 0
    assert (cols["x"] >= 100).all() and (cols["x"] <= 300).all()
    assert (cols["y"] >= 100).all() and (cols["y"] <= 300).all()
    # Window in an un-covered LoD returns nothing.
    cols2, desc2 = store.read_keypoints_from_coordinates(100, 300, 100, 300, 3)
    assert len(desc2) == 0


def test_delete_image_cascades_keypoints(rng):
    store = FeatureStore()
    a = _add_image_with_kps(store, rng, lod=0, n=50)
    b = _add_image_with_kps(store, rng, lod=0, n=70)
    assert len(store) == 120
    store.delete_image(a)
    assert len(store) == 70
    cols, _ = store.read_keypoints_from_lod(0)
    assert (cols["image_id"] == b).all()


def test_elevation_and_world_coordinates(rng):
    store = FeatureStore()
    # Mosaic at lon 10..11, lat 56..55 (north-up), 100×100 px.
    gt = np.array([10.0, 0.01, 0.0, 56.0, 0.0, -0.01])
    store.set_geotransform(1, gt)
    elev = np.full((100, 100), 147.0, np.float32)
    store.set_elevation(elev, gt)
    assert store.get_elevation(5, 5) == 147.0
    xyz = store.get_world_coordinates(1, 50.0, 50.0)
    # ECEF magnitude ≈ earth radius + 147 m.
    r = np.linalg.norm(xyz)
    assert 6.3e6 < r < 6.4e6
    # Against the closed-form ECEF of the known lon/lat/h.
    from cubesat_apds_tpu.core import geodesy as G
    expected = np.asarray(G.geodetic_to_ecef(10.5, 55.5, 147.0))
    np.testing.assert_allclose(np.asarray(xyz).ravel(), expected.ravel(),
                               atol=1.0)


def test_export_device_block_padding(rng):
    store = FeatureStore()
    _add_image_with_kps(store, rng, lod=0, n=100)
    desc, xy, valid, img_id = store.export_device_block(lod=0,
                                                        pad_multiple=64)
    assert desc.shape[0] % 64 == 0
    assert valid.sum() == 100
    assert (desc[~valid] == 0).all()


def test_save_load_roundtrip(rng, tmp_path):
    store = FeatureStore()
    a = _add_image_with_kps(store, rng, lod=0, n=80)
    gt = np.array([10.0, 0.01, 0.0, 56.0, 0.0, -0.01])
    store.set_geotransform(1, gt)
    store.set_elevation(np.ones((10, 10), np.float32) * 5, gt)
    store.save(str(tmp_path / "db"))
    loaded = FeatureStore.load(str(tmp_path / "db"))
    assert len(loaded) == 80
    c1, d1 = store.read_keypoints_from_lod(0)
    c2, d2 = loaded.read_keypoints_from_lod(0)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_allclose(c1["response"], c2["response"])
    assert loaded.get_elevation(3, 3) == 5.0
    # New images continue the id sequence.
    nid = loaded.create_image(0, 0, 1, 1, 0)
    assert nid == a + 1


def test_top_level_api_exports():
    """Every name in the package's lazy export table resolves, and the
    eager type/config exports are present (the public API surface)."""
    import cubesat_apds_tpu as apds

    for name in apds._LAZY:
        assert getattr(apds, name) is not None, name
    for name in ("CameraModel", "PipelineConfig", "Keypoints", "Matches",
                 "MAX_POINTS"):
        assert hasattr(apds, name), name
    assert "localize_frame_jit" in dir(apds)
