"""End-to-end pipeline tests: preprocess (DB build) + localize (frame→pose).

This is the minimum end-to-end slice of SURVEY.md §7 step 3, exercised on
synthetic GeoTIFF fixtures.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cubesat_apds_tpu.core.config import (
    AkazeConfig,
    MatchConfig,
    PipelineConfig,
    RansacConfig,
)
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.io.mosaic import MosaicDataset
from cubesat_apds_tpu.io.tiff import write_geotiff
from cubesat_apds_tpu.pipelines.localize import (
    load_device_db,
    localize_frame,
    localize_frame_jit,
)
from cubesat_apds_tpu.pipelines.preprocess import preprocess
from cubesat_apds_tpu.store.feature_store import FeatureStore


CFG = PipelineConfig(
    akaze=AkazeConfig(capacity=512),
    match=MatchConfig(ratio=0.75),
    ransac=RansacConfig(num_hypotheses=256),
)


def _scene_image(rng, n=256):
    """Corner-rich synthetic satellite scene."""
    img = np.zeros((n, n), np.float32)
    for _ in range(40):
        cy, cx = rng.integers(10, n - 40, 2)
        s = int(rng.integers(8, 24))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.3, 1.0)
    return img


@pytest.fixture
def mosaic_dir(tmp_path, rng):
    img = _scene_image(rng, 256)
    rgb = np.stack([img, img, img], -1)
    rgb8 = (rgb * 255).astype(np.uint8)
    write_geotiff(str(tmp_path / "scene.tif"), rgb8,
                  [10.0, 0.001, 0, 56.0, 0, -0.001])
    return tmp_path, img


def test_preprocess_builds_store(mosaic_dir):
    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, stats = preprocess(ds, config=CFG, amount_lod=1)
    assert stats.tiles >= 1
    assert stats.keypoints > 20
    assert len(store) == stats.keypoints
    imgs = store.find_images_from_lod(0)
    assert len(imgs) >= 1
    # Keypoint coordinates are in the reference (mosaic) frame.
    cols, _ = store.read_keypoints_from_lod(0)
    assert (cols["x"] >= 0).all() and (cols["x"] <= 256).all()


def test_preprocess_multi_lod(mosaic_dir):
    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, stats = preprocess(ds, config=CFG, amount_lod=2)
    assert stats.lods == 2
    assert len(store.find_images_from_lod(0)) == 4   # 2x2 grid of 128px
    assert len(store.find_images_from_lod(1)) == 1   # 1 tile of 256->128
    # LoD 1 keypoints upscaled: coordinates still span the full frame.
    cols, _ = store.read_keypoints_from_lod(1)
    if len(cols["x"]) > 0:
        assert cols["x"].max() > 64


def _processed_gray(ds, x, y, w, h):
    """The same normalize+gamma pixels the preprocessor fed to AKAZE."""
    from cubesat_apds_tpu.ops.image import rgb_to_gray

    rgba = ds.to_rgb((x, y), (w, h), (w, h))
    return np.asarray(rgb_to_gray(jnp.asarray(rgba[..., :3])))


def test_localize_same_frame_identity(mosaic_dir):
    """Localizing the exact source frame must produce ~identity homography
    to the reference frame."""
    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, _ = preprocess(ds, config=CFG, amount_lod=1)
    cam = CameraModel.ideal(300.0, 300.0, 128.0, 128.0)
    frame = _processed_gray(ds, 0, 0, 256, 256)
    res = localize_frame(frame, store, cam, lod=0, config=CFG)
    assert int(res.num_matches) >= 8
    assert bool(res.homography.ok)
    H = np.asarray(res.homography.H)
    # Identity up to subpixel jitter.
    assert abs(H[0, 2]) < 2.0 and abs(H[1, 2]) < 2.0
    assert H[0, 0] == pytest.approx(1.0, abs=0.05)
    assert H[1, 1] == pytest.approx(1.0, abs=0.05)


def test_localize_shifted_frame(mosaic_dir, rng):
    """A cropped sub-window must localize at its offset in the mosaic."""
    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, _ = preprocess(ds, config=CFG, amount_lod=1)
    cam = CameraModel.ideal(300.0, 300.0, 64.0, 64.0)
    full = _processed_gray(ds, 0, 0, 256, 256)
    crop = full[64:192, 32:160]                      # offset (x=32, y=64)
    res = localize_frame(crop, store, cam, lod=0, config=CFG)
    assert bool(res.homography.ok)
    H = np.asarray(res.homography.H)
    assert H[0, 2] == pytest.approx(32.0, abs=2.0)
    assert H[1, 2] == pytest.approx(64.0, abs=2.0)


def test_localize_with_pose(mosaic_dir, tmp_path):
    """With elevation attached, the PnP path must return a sane camera
    pose (camera center above the scene at plausible ECEF magnitude)."""
    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    elev = np.full((64, 64), 100, np.uint8)
    edir = tmp_path / "elev"
    edir.mkdir(exist_ok=True)
    write_geotiff(str(edir / "e.tif"), elev, [10.0, 0.004, 0, 56.0, 0, -0.004])
    store, _ = preprocess(ds, config=CFG, amount_lod=1,
                          elevation_path=str(edir / "e.tif"))
    cam = CameraModel.ideal(300.0, 300.0, 128.0, 128.0)
    res = localize_frame(img, store, cam, lod=0, config=CFG, solve_pose=True)
    assert res.pose is not None
    assert bool(res.pose.ok)
    assert int(res.pose.num_inliers) >= 6


def test_device_db_export(mosaic_dir):
    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, _ = preprocess(ds, config=CFG, amount_lod=1)
    db = load_device_db(store, lod=0, pad_multiple=256)
    assert db.descriptors.shape[0] % 256 == 0
    assert int(db.valid.sum()) == len(store)


def test_localize_coarse_to_fine(mosaic_dir):
    """Two-stage LoD localization: coarse fix narrows the fine search
    window; fine result recovers the frame offset."""
    from cubesat_apds_tpu.pipelines.localize import localize_coarse_to_fine

    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, _ = preprocess(ds, config=CFG, amount_lod=2)
    cam = CameraModel.ideal(300.0, 300.0, 64.0, 64.0)
    full = _processed_gray(ds, 0, 0, 256, 256)
    crop = full[64:192, 32:160]                      # offset (x=32, y=64)
    fine, coarse, window = localize_coarse_to_fine(
        crop, store, cam, config=CFG, pad_multiple=256)
    assert bool(fine.homography.ok)
    H = np.asarray(fine.homography.H)
    assert H[0, 2] == pytest.approx(32.0, abs=2.5)
    assert H[1, 2] == pytest.approx(64.0, abs=2.5)
    if window is not None:
        x0, x1, y0, y1 = window
        # The window contains the crop's true footprint [32,160]x[64,192].
        assert x0 < 40 and x1 > 150 and y0 < 72 and y1 > 180


def test_coarse_to_fine_capacity_ladder(mosaic_dir, rng):
    """Different fine-window sizes must reuse the compiled executable:
    the fine DB pads to a geometric capacity ladder (powers of two of
    pad_multiple), not per-window sizes (VERDICT r1 weak #4)."""
    from cubesat_apds_tpu.pipelines.localize import localize_coarse_to_fine

    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, _ = preprocess(ds, config=CFG, amount_lod=2)
    cam = CameraModel.ideal(300.0, 300.0, 64.0, 64.0)

    frame1 = img[:128, :128]
    frame2 = img[40:168, 30:158]
    n0 = localize_frame_jit._cache_size()
    r1 = localize_coarse_to_fine(frame1, store, cam, CFG, pad_multiple=256)
    n1 = localize_frame_jit._cache_size()
    # Second query, different window geometry → same ladder rung → the
    # jit cache must NOT grow.
    r2 = localize_coarse_to_fine(frame2, store, cam, CFG, pad_multiple=256)
    n2 = localize_frame_jit._cache_size()
    assert n2 == n1, f"fine-stage recompile: cache {n1} -> {n2}"
    assert r1[0] is not None and r2[0] is not None


def test_localizer_caches_device_db(mosaic_dir):
    """Localizer exports/uploads the store once per LoD (weak #7)."""
    from cubesat_apds_tpu.pipelines.localize import Localizer

    path, img = mosaic_dir
    ds = MosaicDataset.from_folder(str(path))
    store, _ = preprocess(ds, config=CFG, amount_lod=1)
    cam = CameraModel.ideal(300.0, 300.0, 128.0, 128.0)
    loc = Localizer(store, cam, CFG)
    r1 = loc.localize(img)
    db_obj = loc.device_db(0)
    r2 = loc.localize(img[::-1].copy())
    assert loc.device_db(0) is db_obj   # no re-export
    assert int(r1.num_keypoints) > 0 and int(r2.num_keypoints) > 0


def test_preprocess_ragged_no_duplicate_keypoints(tmp_path, rng):
    """Edge-shifted ragged tiles must not double-store keypoints from
    their overlap band (twin descriptors make the Lowe ratio gate
    reject every match over the band — code-review round 2)."""
    from scipy.spatial import cKDTree

    img = _scene_image(rng, 256)
    # 201-px-wide mosaic → lod_tile_grid(201·?) ragged columns. Use a
    # 256×201 crop: amount_lod=2 → tile 100×128, off_x=[0,100,101].
    crop = np.ascontiguousarray(img[:, :201])
    rgb8 = (np.stack([crop] * 3, -1) * 255).astype(np.uint8)
    write_geotiff(str(tmp_path / "r.tif"), rgb8,
                  [10.0, 0.001, 0, 56.0, 0, -0.001])
    ds = MosaicDataset.from_folder(str(tmp_path))
    store, _ = preprocess(ds, config=CFG, amount_lod=2)

    cols, desc = store.read_keypoints_from_lod(0)
    xy = np.stack([cols["x"], cols["y"]], -1)
    if len(xy) >= 2:
        d, idx = cKDTree(xy).query(xy, k=2)
        twins = d[:, 1] < 0.25
        # Co-located keypoints at ≥2 evolution levels apart are
        # legitimate; exact duplicates from tile overlap are not.
        same_desc = (desc[np.arange(len(xy))[twins]]
                     == desc[idx[twins, 1]]).all(axis=1)
        assert not same_desc.any(), "duplicate keypoints stored"


def test_hybrid_mode_end_to_end(mosaic_dir):
    """Full preprocess → localize slice in descriptor_mode='hybrid':
    the store is stamped with the subdivision tag and a same-scene frame
    localizes with a near-identity homography."""
    import dataclasses

    path, img = mosaic_dir
    cfg = dataclasses.replace(
        CFG, akaze=dataclasses.replace(CFG.akaze,
                                       descriptor_mode="hybrid"))
    ds = MosaicDataset.from_folder(str(path))
    store, stats = preprocess(ds, config=cfg, amount_lod=1)
    assert store.descriptor_mode == "hybrid2"
    assert stats.keypoints > 0

    cam = CameraModel.ideal(256.0, 256.0, 128.0, 128.0)
    res = localize_frame(jnp.asarray(img), store, cam, config=cfg)
    assert bool(res.homography.ok)
    H = np.asarray(res.homography.H)
    np.testing.assert_allclose(H, np.eye(3), atol=1.5)


def test_preprocess_checkpoint_resume(mosaic_dir, tmp_path, monkeypatch):
    """A crashed preprocess resumes from its checkpoint and produces a
    store identical to an uninterrupted run — the partial-DB recovery
    the reference lacks entirely (SURVEY.md §5: its only restart point
    is the materialized mosaic). Also: a cursor written under different
    run parameters is refused, and the checkpoint is removed on
    success."""
    import json
    import os

    import cubesat_apds_tpu.pipelines.preprocess as pp

    path, img = mosaic_dir
    ref_store, ref_stats = preprocess(
        MosaicDataset.from_folder(str(path)), config=CFG,
        amount_lod=2, tile_batch=1)

    ck = str(tmp_path / "ckpt")
    orig = pp.detect_and_compute_batch
    calls = {"n": 0}

    def flaky(batch, cfg):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected crash")
        return orig(batch, cfg)

    monkeypatch.setattr(pp, "detect_and_compute_batch", flaky)
    with pytest.raises(RuntimeError, match="injected crash"):
        preprocess(MosaicDataset.from_folder(str(path)), config=CFG,
                   amount_lod=2, tile_batch=1,
                   checkpoint_dir=ck, checkpoint_every=1)
    monkeypatch.setattr(pp, "detect_and_compute_batch", orig)

    with open(os.path.join(ck, "cursor.json")) as f:
        cursor = json.load(f)
    assert (cursor["lod"], cursor["start"]) == (0, 1)  # 2 batches done

    # Resuming under DIFFERENT parameters must refuse, not corrupt.
    with pytest.raises(ValueError, match="different run"):
        preprocess(MosaicDataset.from_folder(str(path)), config=CFG,
                   amount_lod=1, tile_batch=1,
                   checkpoint_dir=ck, resume=True)

    store, stats = preprocess(
        MosaicDataset.from_folder(str(path)), config=CFG,
        amount_lod=2, tile_batch=1, checkpoint_dir=ck, resume=True)
    assert not os.path.exists(ck)      # checkpoint removed on success
    assert stats.keypoints == ref_stats.keypoints
    assert stats.tiles == ref_stats.tiles
    assert sorted(store._images) == sorted(ref_store._images)
    for iid in ref_store._images:
        a, da = ref_store.read_keypoints_from_image_id(iid)
        b, db_ = store.read_keypoints_from_image_id(iid)
        for c in a:
            np.testing.assert_array_equal(a[c], b[c])
        np.testing.assert_array_equal(da, db_)
