"""Device-side spatial pruning (pipelines.localize pruned serving path).

The store's bbox-per-LoD query (keypointdb.rs:67-90) run ON DEVICE:
coarse fix → reference-frame window → masked compaction → subset match.
Must agree with the full-DB step whenever the window holds the true
region (VERDICT r3 next #2: 'the pruning must not cost accuracy')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubesat_apds_tpu.core.config import (
    AkazeConfig, MatchConfig, PipelineConfig, PnPConfig, RansacConfig)
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
from cubesat_apds_tpu.pipelines.localize import (
    DeviceDb,
    localize_frame_jit,
    localize_frame_pruned_jit,
    make_pruned_db,
)

CFG = PipelineConfig(
    akaze=AkazeConfig(capacity=512),
    match=MatchConfig(ratio=0.75),
    ransac=RansacConfig(num_hypotheses=64),
    pnp=PnPConfig(num_hypotheses=32))
CAM = CameraModel.ideal(200.0, 200.0, 128.0, 128.0)


@pytest.fixture(scope="module")
def scene(rng_module):
    rng = rng_module
    n = 256
    img = np.zeros((n, n), np.float32)
    for _ in range(60):
        cy, cx = rng.integers(6, n - 30, 2)
        s = int(rng.integers(6, 24))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.2, 1.0)
    frame = jnp.asarray(np.roll(img, (4, 7), axis=(0, 1)))
    feats = detect_and_compute(jnp.asarray(img), CFG.akaze)

    m = 4096
    desc = np.array(jax.random.randint(jax.random.key(1), (m, 61), 0, 256,
                                       jnp.uint8))
    xy = np.array(jax.random.uniform(jax.random.key(2), (m, 2),
                                     jnp.float32, 0.0, 2048.0))
    valid = np.ones(m, bool)
    desc[:512] = np.asarray(feats.descriptors)
    xy[:512] = np.asarray(feats.keypoints.xy)
    valid[:512] = np.asarray(feats.keypoints.valid)
    obj = np.concatenate([xy * 0.1, np.zeros((m, 1))], 1).astype(np.float32)
    db = DeviceDb(descriptors=jnp.asarray(desc), xy=jnp.asarray(xy),
                  valid=jnp.asarray(valid),
                  obj_points=jnp.asarray(obj), has_world=True)
    coarse = DeviceDb(descriptors=jnp.asarray(desc[::4]),
                      xy=jnp.asarray(xy[::4]),
                      valid=jnp.asarray(valid[::4]),
                      obj_points=jnp.asarray(obj[::4]), has_world=True)
    return frame, db, coarse


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(3)


def test_pruned_matches_full_db(scene):
    frame, db, coarse = scene
    pdb = make_pruned_db(db, coarse, window_capacity=1024)
    pr = localize_frame_pruned_jit(frame, pdb, CAM, CFG, solve_pose=True)
    full = localize_frame_jit(frame, db, CAM, CFG, solve_pose=True)

    assert bool(pr.coarse_ok)
    assert not bool(pr.overflow)
    assert 0 < int(pr.n_window) <= 1024
    assert bool(pr.result.homography.ok)
    np.testing.assert_allclose(np.asarray(pr.result.homography.H),
                               np.asarray(full.homography.H), atol=0.5)
    # Inlier sets by GLOBAL row id: pruning must not change the answer.
    sel = np.asarray(pr.sel)
    p_m = np.asarray(pr.result.matches.valid) & \
        np.asarray(pr.result.homography.inliers)
    f_m = np.asarray(full.matches.valid) & np.asarray(full.homography.inliers)
    p_ids = set(sel[np.asarray(pr.result.matches.train_idx)[p_m]].tolist())
    f_ids = set(np.asarray(full.matches.train_idx)[f_m].tolist())
    jac = len(p_ids & f_ids) / max(len(p_ids | f_ids), 1)
    assert jac > 0.95, f"inlier jaccard {jac}"
    # PnP agrees too (same correspondences → same pose up to f32 noise).
    assert bool(pr.result.pose.ok) and bool(full.pose.ok)
    np.testing.assert_allclose(np.asarray(pr.result.pose.rvec),
                               np.asarray(full.pose.rvec), atol=5e-2)


def test_pruned_window_contains_true_region(scene):
    frame, db, coarse = scene
    pdb = make_pruned_db(db, coarse, window_capacity=1024)
    pr = localize_frame_pruned_jit(frame, pdb, CAM, CFG, solve_pose=False)
    x0, x1, y0, y1 = (float(v) for v in np.asarray(pr.window))
    # The frame is a roll of the DB scene: true region ≈ [0, 256]².
    assert x0 < 5 and y0 < 5 and x1 > 250 and y1 > 250
    # Selected global ids are exactly the in-window valid rows.
    sel = np.asarray(pr.sel)
    sel = sel[sel < len(np.asarray(db.xy))]
    xy = np.asarray(db.xy)
    inw = (np.asarray(db.valid) & (xy[:, 0] >= x0) & (xy[:, 0] <= x1)
           & (xy[:, 1] >= y0) & (xy[:, 1] <= y1))
    np.testing.assert_array_equal(np.sort(sel), np.flatnonzero(inw))
    assert int(pr.n_window) == int(inw.sum())


def test_pruned_overflow_flag(scene):
    frame, db, coarse = scene
    pdb = make_pruned_db(db, coarse, window_capacity=64)  # far too small
    pr = localize_frame_pruned_jit(frame, pdb, CAM, CFG, solve_pose=False)
    assert bool(pr.overflow)
    # n_window counts exact-window rows among the ≤64 SELECTED slots.
    assert int(pr.n_window) <= 64


def test_pruned_row_packing_roundtrip(scene):
    from cubesat_apds_tpu.pipelines.localize import (
        _pack_prune_rows, _unpack_prune_rows)

    _frame, db, _coarse = scene
    rows = jax.jit(_pack_prune_rows)(db.descriptors, db.xy, db.obj_points)
    desc, xy, obj = _unpack_prune_rows(rows)
    np.testing.assert_array_equal(np.asarray(desc),
                                  np.asarray(db.descriptors))
    np.testing.assert_array_equal(np.asarray(xy), np.asarray(db.xy))
    np.testing.assert_array_equal(np.asarray(obj),
                                  np.asarray(db.obj_points))


def test_pruned_coarse_failure_is_reported(scene):
    """A coarse DB with no matchable rows → coarse_ok False (callers
    fall back to the full-DB step)."""
    frame, db, _ = scene
    bad = DeviceDb(
        descriptors=jnp.zeros((256, 61), jnp.uint8),
        xy=jnp.zeros((256, 2), jnp.float32),
        valid=jnp.zeros(256, bool),
        obj_points=jnp.zeros((256, 3), jnp.float32), has_world=True)
    pdb = make_pruned_db(db, bad, window_capacity=1024)
    pr = localize_frame_pruned_jit(frame, pdb, CAM, CFG, solve_pose=False)
    assert not bool(pr.coarse_ok)


def test_pruned_fallback_equals_full_db(scene):
    """The row-table fallback step must reproduce the plain full-DB
    step exactly (same descriptors/xy/obj reconstructed, same matches)."""
    from cubesat_apds_tpu.pipelines.localize import (
        localize_frame_pruned_fallback_jit, make_pruned_db)

    frame, db, coarse = scene
    pdb = make_pruned_db(db, coarse, window_capacity=1024)
    fb = localize_frame_pruned_fallback_jit(frame, pdb, CAM, CFG,
                                            solve_pose=True)
    full = localize_frame_jit(frame, db, CAM, CFG, solve_pose=True)
    assert bool(fb.homography.ok) and bool(full.homography.ok)
    np.testing.assert_allclose(np.asarray(fb.homography.H),
                               np.asarray(full.homography.H), atol=0.5)
    assert int(fb.num_matches) == int(full.num_matches)
    np.testing.assert_allclose(np.asarray(fb.pose.rvec),
                               np.asarray(full.pose.rvec), atol=5e-2)


def test_streaming_pruned(scene):
    """StreamingLocalizer with a PrunedDeviceDb: per-frame results equal
    the one-shot pruned step, for batch=1 and micro-batched."""
    from cubesat_apds_tpu.pipelines.localize import make_pruned_db
    from cubesat_apds_tpu.pipelines.stream import StreamingLocalizer

    frame, db, coarse = scene
    pdb = make_pruned_db(db, coarse, window_capacity=1024)
    ref = localize_frame_pruned_jit(frame, pdb, CAM, CFG, solve_pose=True)
    frames = [np.asarray(frame)] * 3
    for batch in (1, 2):
        s = StreamingLocalizer(pdb, CAM, CFG, solve_pose=True,
                               batch=batch, transfer_uint8=False)
        results = list(s.run(frames))
        assert len(results) == 3
        assert s.fallback_frames == 0
        for r in results:
            assert r.homography_ok
            np.testing.assert_allclose(
                r.homography, np.asarray(ref.result.homography.H),
                atol=0.5)
            assert r.pose_ok


def test_streaming_pruned_fallback(scene):
    """Coarse-miss frames rerun through the full-DB fallback: with an
    unmatchable coarse DB every frame falls back, and the answers equal
    the full-DB step."""
    from cubesat_apds_tpu.pipelines.localize import make_pruned_db
    from cubesat_apds_tpu.pipelines.stream import StreamingLocalizer

    frame, db, _coarse = scene
    bad = DeviceDb(
        descriptors=jnp.zeros((256, 61), jnp.uint8),
        xy=jnp.zeros((256, 2), jnp.float32),
        valid=jnp.zeros(256, bool),
        obj_points=jnp.zeros((256, 3), jnp.float32), has_world=True)
    pdb = make_pruned_db(db, bad, window_capacity=1024)
    full = localize_frame_jit(frame, db, CAM, CFG, solve_pose=True)
    s = StreamingLocalizer(pdb, CAM, CFG, solve_pose=True,
                           transfer_uint8=False)
    results = list(s.run([np.asarray(frame)] * 2))
    assert s.fallback_frames == 2
    for r in results:
        assert r.homography_ok
        np.testing.assert_allclose(r.homography,
                                   np.asarray(full.homography.H), atol=0.5)


def test_streaming_pruned_rejects_mesh(scene):
    from cubesat_apds_tpu.pipelines.localize import make_pruned_db
    from cubesat_apds_tpu.pipelines.stream import StreamingLocalizer
    from cubesat_apds_tpu.parallel.mesh import make_mesh

    frame, db, coarse = scene
    pdb = make_pruned_db(db, coarse)
    with pytest.raises(ValueError, match="pruned streaming"):
        StreamingLocalizer(pdb, CAM, CFG, mesh=make_mesh(dp=2, tp=4))
