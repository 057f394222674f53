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


def test_binary_append_segment(rng, tmp_path):
    """append_binary_store: new tiles land as a new segment with remapped
    image ids; merged queries equal a from-scratch export of the union
    (insert semantics, imagedb.rs:14-29 / keypointdb.rs:15-26)."""
    from cubesat_apds_tpu.store.binary_store import append_binary_store

    s1 = _build_store(rng, n_imgs=2)
    s2 = _build_store(rng, n_imgs=2)
    write_binary_store(s1, str(tmp_path / "bin"))
    append_binary_store(str(tmp_path / "bin"), s2)
    b = BinaryFeatureStore(str(tmp_path / "bin"))

    # Reference union built in RAM.
    union = _build_store(rng, n_imgs=0)
    for s in (s1, s2):
        remap = {}
        for r in sorted(s._images.values(), key=lambda r: r.id):
            remap[r.id] = union.create_image(
                r.x_start, r.y_start, r.x_end, r.y_end, r.level_of_detail)
        cols, desc = s._kp, s._desc
        for old, new in remap.items():
            sel = cols["image_id"] == old
            union.add_keypoints(
                new, cols["x"][sel], cols["y"][sel], cols["size"][sel],
                cols["angle"][sel], cols["response"][sel],
                cols["octave"][sel], cols["class_id"][sel], desc[sel])

    assert len(b) == len(union)
    assert sorted(b.images) == sorted(union._images)
    for lod in (0, 1):
        c_ref, d_ref = union.read_keypoints_from_lod(lod)
        c_bin, d_bin = b.read_keypoints_from_lod(lod)
        np.testing.assert_array_equal(d_ref, d_bin)
        np.testing.assert_allclose(c_ref["response"], c_bin["response"])
        np.testing.assert_array_equal(c_ref["image_id"], c_bin["image_id"])
    c_ref, d_ref = union.read_keypoints_from_coordinates(100, 700, 50, 800, 0)
    c_bin, d_bin = b.read_keypoints_from_coordinates(100, 700, 50, 800, 0)
    np.testing.assert_array_equal(d_ref, d_bin)


def test_binary_append_adopts_and_validates_elevation(rng, tmp_path):
    """append_binary_store persists an appended store's elevation when the
    base has none (has_elevation flips, raster lands on disk) and rejects
    a conflicting DEM — losing it silently would disable/skew every PnP
    world coordinate (elevationdb.rs:191-232 semantics)."""
    from cubesat_apds_tpu.store.binary_store import append_binary_store

    dem = rng.uniform(0, 100, (8, 8)).astype(np.float32)
    dem_gt = [10.0, 0.01, 0, 56.0, 0, -0.01]

    s1 = _build_store(rng, n_imgs=1)
    write_binary_store(s1, str(tmp_path / "bin"))
    assert BinaryFeatureStore(str(tmp_path / "bin"))._elevation is None

    # Append WITH elevation onto an elevation-less base: adopted.
    s2 = _build_store(rng, n_imgs=1)
    s2.set_elevation(dem, dem_gt)
    append_binary_store(str(tmp_path / "bin"), s2)
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    assert b.manifest["has_elevation"]
    np.testing.assert_array_equal(np.asarray(b._elevation), dem)

    # Matching DEM re-appends fine; a different raster or placement raises.
    s3 = _build_store(rng, n_imgs=1)
    s3.set_elevation(dem, dem_gt)
    append_binary_store(str(tmp_path / "bin"), s3)
    s4 = _build_store(rng, n_imgs=1)
    s4.set_elevation(dem + 1.0, dem_gt)
    with pytest.raises(ValueError, match="elevation raster mismatch"):
        append_binary_store(str(tmp_path / "bin"), s4)
    s4.set_elevation(dem, [11.0, 0.01, 0, 57.0, 0, -0.01])
    with pytest.raises(ValueError, match="elevation geotransform mismatch"):
        append_binary_store(str(tmp_path / "bin"), s4)


def test_binary_cascaded_delete(rng, tmp_path):
    """delete_image cascades to the image's keypoints in every query
    path and survives a reopen (imagedb.rs:66-72 + FK cascade)."""
    store = _build_store(rng, n_imgs=3)
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    n0 = len(b)
    b.delete_image(2)
    assert len(b) == n0 - 200
    assert 2 not in b.images
    c, d = b.read_keypoints_from_image_id(2)
    assert len(d) == 0
    for lod in (0, 1):
        c, d = b.read_keypoints_from_lod(lod)
        assert (c["image_id"] != 2).all()
        assert (np.diff(c["response"]) <= 0).all()
    # Mirror the delete in the RAM store: remaining rows must agree.
    store.delete_image(2)
    c_ref, d_ref = store.read_keypoints_from_lod(1)
    c_bin, d_bin = b.read_keypoints_from_lod(1)
    np.testing.assert_array_equal(d_ref, d_bin)
    # Reopen: the delete is durable.
    b2 = BinaryFeatureStore(str(tmp_path / "bin"))
    assert len(b2) == n0 - 200
    c, d = b2.read_keypoints_from_image_id(2)
    assert len(d) == 0


def test_binary_append_then_delete_old_segment(rng, tmp_path):
    """Delete of a pre-append image leaves appended rows intact and the
    cross-segment descriptor gather correct."""
    from cubesat_apds_tpu.store.binary_store import append_binary_store

    s1 = _build_store(rng, n_imgs=2)
    s2 = _build_store(rng, n_imgs=1)
    write_binary_store(s1, str(tmp_path / "bin"))
    append_binary_store(str(tmp_path / "bin"), s2)
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    b.delete_image(1)
    assert len(b) == 2 * 200
    # Appended image id is 3 (serial continuation).
    c, d = b.read_keypoints_from_image_id(3)
    assert len(d) == 200
    np.testing.assert_array_equal(
        np.sort(d, axis=None), np.sort(np.asarray(s2._desc), axis=None))


def test_binary_append_rejects_frame_mismatch(rng, tmp_path):
    """Appending tiles from a differently-georeferenced mosaic must be
    refused — keypoint xy are in the mosaic reference frame."""
    from cubesat_apds_tpu.store.binary_store import append_binary_store

    s1 = _build_store(rng, n_imgs=1)
    s1.set_geotransform(1, [10.0, 0.001, 0, 56.0, 0, -0.001])
    write_binary_store(s1, str(tmp_path / "bin"))
    s2 = _build_store(rng, n_imgs=1)
    s2.set_geotransform(1, [11.0, 0.001, 0, 57.0, 0, -0.001])
    with pytest.raises(ValueError, match="geotransform mismatch"):
        append_binary_store(str(tmp_path / "bin"), s2)
    # Same frame appends fine.
    s2.set_geotransform(1, [10.0, 0.001, 0, 56.0, 0, -0.001])
    append_binary_store(str(tmp_path / "bin"), s2)
    assert len(BinaryFeatureStore(str(tmp_path / "bin"))) == 400


def test_descriptor_mode_provenance(rng, tmp_path):
    """Stores record which AKAZE descriptor_mode built them; the serving
    path refuses a store/config mismatch (silently matching exact
    descriptors against a fast-mode DB yields near-zero matches with no
    other symptom). Appends must agree with the existing store."""
    import dataclasses

    from cubesat_apds_tpu.core.config import PipelineConfig
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.pipelines.localize import (Localizer,
                                                     check_descriptor_mode)
    from cubesat_apds_tpu.store.binary_store import append_binary_store

    store = _build_store(rng)
    store.descriptor_mode = "fast"

    # npz round-trip keeps the stamp.
    store.save(str(tmp_path / "npz"))
    loaded = FeatureStore.load(str(tmp_path / "npz"))
    assert loaded.descriptor_mode == "fast"

    # binary round-trip keeps the stamp.
    write_binary_store(store, str(tmp_path / "bin"))
    b = BinaryFeatureStore(str(tmp_path / "bin"))
    assert b.descriptor_mode == "fast"

    exact_cfg = PipelineConfig()
    assert exact_cfg.akaze.descriptor_mode == "exact"
    fast_cfg = dataclasses.replace(
        exact_cfg, akaze=dataclasses.replace(exact_cfg.akaze,
                                             descriptor_mode="fast"))
    cam = CameraModel.ideal(100.0, 100.0, 50.0, 50.0)
    for s in (loaded, b):
        with pytest.raises(ValueError, match="descriptor_mode"):
            Localizer(s, cam, config=exact_cfg)
        Localizer(s, cam, config=fast_cfg)          # matching: fine
    # Unknown provenance (pre-provenance store) is accepted as-is.
    unknown = _build_store(rng)
    assert unknown.descriptor_mode is None
    check_descriptor_mode(unknown, exact_cfg)

    # Append with conflicting provenance is refused; matching is fine.
    extra = _build_store(rng)
    extra.descriptor_mode = "exact"
    with pytest.raises(ValueError, match="descriptor_mode"):
        append_binary_store(str(tmp_path / "bin"), extra)
    extra.descriptor_mode = "fast"
    append_binary_store(str(tmp_path / "bin"), extra)
    assert BinaryFeatureStore(str(tmp_path / "bin")).descriptor_mode == "fast"


def test_descriptor_tag_includes_hybrid_subdivision(rng, tmp_path):
    """hybrid sub=2 and sub=3 bits are incompatible, so the provenance
    tag carries the subdivision and the mix-guard separates them."""
    import dataclasses

    from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.pipelines.localize import Localizer

    h2 = AkazeConfig(descriptor_mode="hybrid", hybrid_subcells=2)
    h3 = AkazeConfig(descriptor_mode="hybrid", hybrid_subcells=3)
    assert h2.descriptor_tag == "hybrid2" and h3.descriptor_tag == "hybrid3"

    store = _build_store(rng)
    store.descriptor_mode = "hybrid2"
    cam = CameraModel.ideal(100.0, 100.0, 50.0, 50.0)
    cfg3 = dataclasses.replace(PipelineConfig(), akaze=h3)
    with pytest.raises(ValueError, match="hybrid2"):
        Localizer(store, cam, config=cfg3)
    Localizer(store, cam, config=dataclasses.replace(PipelineConfig(),
                                                     akaze=h2))

    # Unknown mode strings are rejected at config construction.
    with pytest.raises(ValueError, match="descriptor_mode"):
        AkazeConfig(descriptor_mode="hybird")


def test_binary_store_fuzz_vs_model(rng, tmp_path):
    """Model-based fuzz: a random interleaving of segment appends,
    cascaded deletes, and disk reopens must keep every query
    (response-DESC LoD scan, spatial window) identical to an in-RAM
    FeatureStore replaying the same operations. Pins the segmented
    order-index/alive-bitmap machinery to the reference's Postgres
    semantics (keypointdb.rs:50-90, imagedb.rs:66-72) under mutation,
    not just single-shot round-trips."""
    from cubesat_apds_tpu.store.binary_store import append_binary_store

    path = str(tmp_path / "fuzz")

    def make_batch(n_imgs):
        s = FeatureStore()
        data = []
        for _ in range(n_imgs):
            lod = int(rng.integers(0, 3))
            n = int(rng.integers(20, 80))
            x = rng.uniform(0, 1000, n).astype(np.float32)
            y = rng.uniform(0, 1000, n).astype(np.float32)
            resp = rng.uniform(0, 1, n).astype(np.float32)
            desc = rng.integers(0, 256, (n, DESC_BYTES), dtype=np.uint8)
            iid = s.create_image(0, 0, 1000, 1000, lod)
            s.add_keypoints(iid, x, y,
                            size=np.full(n, 4.8, np.float32),
                            angle=np.zeros(n, np.float32), response=resp,
                            octave=np.zeros(n, np.int32),
                            class_id=np.zeros(n, np.int32),
                            descriptors=desc)
            data.append((lod, x, y, resp, desc))
        return s, data

    ref = FeatureStore()   # the in-RAM model, replaying every op

    def replay(data):
        for lod, x, y, resp, desc in data:
            n = len(x)
            iid = ref.create_image(0, 0, 1000, 1000, lod)
            ref.add_keypoints(iid, x, y,
                              size=np.full(n, 4.8, np.float32),
                              angle=np.zeros(n, np.float32), response=resp,
                              octave=np.zeros(n, np.int32),
                              class_id=np.zeros(n, np.int32),
                              descriptors=desc)

    first, data = make_batch(3)
    write_binary_store(first, path)
    replay(data)
    b = BinaryFeatureStore(path)

    def check():
        assert len(b) == len(ref)
        assert sorted(b.images.keys()) == sorted(ref._images.keys())
        for lod in (0, 1, 2):
            c_r, d_r = ref.read_keypoints_from_lod(lod)
            c_b, d_b = b.read_keypoints_from_lod(lod)
            np.testing.assert_array_equal(d_r, d_b)
            np.testing.assert_allclose(c_r["x"], c_b["x"])
        c_r, d_r = ref.read_keypoints_from_coordinates(
            200.0, 700.0, 100.0, 900.0, 0)
        c_b, d_b = b.read_keypoints_from_coordinates(
            200.0, 700.0, 100.0, 900.0, 0)
        np.testing.assert_array_equal(d_r, d_b)

    check()
    for _ in range(8):
        op = rng.choice(["append", "delete", "reopen"])
        if op == "append":
            batch, data = make_batch(int(rng.integers(1, 3)))
            append_binary_store(path, batch)
            replay(data)
            b = BinaryFeatureStore(path)   # appends require reopen
        elif op == "delete" and len(b.images) > 1:
            victim = int(rng.choice(sorted(b.images.keys())))
            b.delete_image(victim)
            ref.delete_image(victim)
        else:
            b = BinaryFeatureStore(path)
        check()


def test_compact_binary_store(rng, tmp_path):
    """`compact` rewrites live rows into one dense segment (the VACUUM
    analogue for delete_image's tombstones): query results are
    preserved bit-exactly, deleted rows' disk is reclaimed, and the
    compacted store accepts further appends with continued serial
    ids."""
    import os

    from cubesat_apds_tpu.store.binary_store import (
        append_binary_store, compact_binary_store)

    p = str(tmp_path / "bin")
    write_binary_store(_build_store(rng), p)          # images 1..3
    append_binary_store(p, _build_store(rng, n_imgs=1))   # image 4

    def desc_bytes():
        total = 0
        for root, _, files in os.walk(p):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files if f == "desc.npy")
        return total

    b = BinaryFeatureStore(p)
    b.delete_image(2)                 # 200 tombstoned rows in seg0
    live = len(b)
    ref = {lod: b.read_keypoints_from_lod(lod) for lod in (0, 1)}
    win_ref = b.read_keypoints_from_coordinates(100, 600, 100, 600, 0)
    size_before = desc_bytes()
    del b

    kept, dropped = compact_binary_store(p)
    assert (kept, dropped) == (live, 200)
    assert not os.path.exists(p + ".tmp") and not os.path.exists(p + ".old")

    c = BinaryFeatureStore(p)
    assert len(c.segments) == 1 and c.n == live and c.alive.all()
    assert 2 not in c.images and sorted(c.images) == [1, 3, 4]
    assert desc_bytes() < size_before
    for lod in (0, 1):
        cols, desc = c.read_keypoints_from_lod(lod)
        for k in cols:
            np.testing.assert_array_equal(cols[k], ref[lod][0][k])
        np.testing.assert_array_equal(desc, ref[lod][1])
    wc, wd = c.read_keypoints_from_coordinates(100, 600, 100, 600, 0)
    np.testing.assert_array_equal(wd, win_ref[1])

    # Serial image ids continue across the compaction boundary.
    append_binary_store(p, _build_store(rng, n_imgs=1))
    c2 = BinaryFeatureStore(p)
    assert len(c2.segments) == 2 and sorted(c2.images) == [1, 3, 4, 5]
