"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: replaces the reference's nonexistent multi-node tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubesat_apds_tpu.core.config import DESC_BYTES
from cubesat_apds_tpu.ops import match as M
from cubesat_apds_tpu.parallel.mesh import make_mesh, replicate, shard_db
from cubesat_apds_tpu.parallel.sharded_match import (
    make_sharded_knn2,
    sharded_knn_match,
)


def _rand_desc(rng, n):
    return rng.integers(0, 256, size=(n, DESC_BYTES), dtype=np.uint8)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(dp=2, tp=4)
    assert mesh2.shape == {"dp": 2, "tp": 4}


def test_sharded_knn2_matches_single_device(rng):
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 64)
    db = _rand_desc(rng, 512)          # 64 per shard
    qb, dbb = M.unpack_bits(q), M.unpack_bits(db)
    d0_ref, d1_ref, i0_ref = (np.asarray(x) for x in M.knn2(qb, dbb))
    fn = make_sharded_knn2(mesh)
    d0, d1, i0 = fn(qb, dbb, jnp.ones(512, bool))
    np.testing.assert_array_equal(np.asarray(d0), d0_ref)
    np.testing.assert_array_equal(np.asarray(d1), d1_ref)
    np.testing.assert_array_equal(np.asarray(i0), i0_ref)


def test_sharded_knn2_tie_break_matches(rng):
    """Exact duplicates across shards: global lowest index must win, same
    as the single-device path."""
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 16)
    db = np.tile(q, (8, 1))            # every shard holds a copy
    qb, dbb = M.unpack_bits(q), M.unpack_bits(db)
    d0_ref, d1_ref, i0_ref = (np.asarray(x) for x in M.knn2(qb, dbb))
    fn = make_sharded_knn2(mesh)
    d0, d1, i0 = fn(qb, dbb, jnp.ones(len(db), bool))
    np.testing.assert_array_equal(np.asarray(i0), i0_ref)
    np.testing.assert_array_equal(np.asarray(i0), np.arange(16))
    np.testing.assert_array_equal(np.asarray(d1), d1_ref)


def test_sharded_knn_match_semantics(rng):
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 32)
    db = np.concatenate([q, _rand_desc(rng, 32)])    # [64] → 8 per shard
    m_ref = M.knn_match(q, db, ratio=0.5)
    m = sharded_knn_match(mesh, q, db, ratio=0.5)
    np.testing.assert_array_equal(np.asarray(m.valid),
                                  np.asarray(m_ref.valid))
    np.testing.assert_array_equal(np.asarray(m.train_idx),
                                  np.asarray(m_ref.train_idx))


def test_sharded_respects_db_valid(rng):
    mesh = make_mesh(dp=1, tp=8)
    q = _rand_desc(rng, 8)
    db = np.concatenate([_rand_desc(rng, 56), q])    # copies in last shard
    db_valid = np.zeros(64, bool)
    db_valid[:56] = True
    m = sharded_knn_match(mesh, q, db, ratio=1.1,
                          db_valid=jnp.asarray(db_valid))
    assert (np.asarray(m.train_idx) < 56).all()
    assert (np.asarray(m.distance) > 0).all()


def test_explicit_device_placement(rng):
    """shard_db actually places shards on distinct devices."""
    mesh = make_mesh(dp=1, tp=8)
    db = jnp.asarray(_rand_desc(rng, 128))
    sharded = shard_db(mesh, db)
    assert len(sharded.sharding.device_set) == 8
    rep = replicate(mesh, jnp.ones(4))
    assert rep.sharding.is_fully_replicated


def test_batch_localizer_matches_single_device(rng):
    """The mesh-parallel serving step (parallel.serve) must agree with
    per-frame single-device localization: same match counts and
    near-identical homographies (GSPMD reorders f32 reductions)."""
    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, RansacConfig)
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.parallel.serve import (
        make_batch_localizer, shard_device_db)
    from cubesat_apds_tpu.pipelines.localize import (
        DeviceDb, localize_frame_jit)

    cfg = PipelineConfig(
        akaze=AkazeConfig(capacity=256),
        match=MatchConfig(ratio=0.75),
        ransac=RansacConfig(num_hypotheses=64))
    cam = CameraModel.ideal(100.0, 100.0, 64.0, 64.0)

    base = np.zeros((128, 128), np.float32)
    for _ in range(25):
        cy, cx = rng.integers(5, 100, 2)
        s = int(rng.integers(8, 20))
        base[cy:cy + s, cx:cx + s] = rng.uniform(0.3, 1.0)
    frames = np.stack([np.roll(base, i, axis=1) for i in range(4)])

    m = 1000   # deliberately NOT a tp multiple (pad path)
    desc = rng.integers(0, 256, (m, 61), dtype=np.uint8)
    xy = rng.uniform(0, 128, (m, 2)).astype(np.float32)
    db = DeviceDb(
        descriptors=jnp.asarray(desc), xy=jnp.asarray(xy),
        valid=jnp.ones(m, bool),
        obj_points=jnp.zeros((m, 3), jnp.float32), has_world=False)

    mesh = make_mesh(dp=2, tp=4)
    db_sh = shard_device_db(mesh, db)
    assert db_sh.descriptors.shape[0] % 4 == 0
    step = make_batch_localizer(mesh, cam, cfg, solve_pose=False)
    with jax.set_mesh(mesh):
        homog, pose, n_match, n_kp = step(jnp.asarray(frames), db_sh)
    assert pose is None

    for i in range(4):
        ref = localize_frame_jit(jnp.asarray(frames[i]), db, cam, cfg,
                                 solve_pose=False)
        assert int(n_kp[i]) == int(ref.num_keypoints)
        assert int(n_match[i]) == int(ref.num_matches)
        if bool(ref.homography.ok):
            assert bool(homog.ok[i])
            np.testing.assert_allclose(
                np.asarray(homog.H[i]), np.asarray(ref.homography.H),
                atol=2e-2)


def test_mesh_parallel_preprocess_matches_single_device(tmp_path, rng):
    """Offline preprocess with a dp-sharded tile batch must produce the
    SAME store as the single-device run (pure data parallelism — the
    TPU-native replacement for the reference's rayon fan-out,
    preprocessor main.rs:227-245)."""
    from PIL import Image

    from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig
    from cubesat_apds_tpu.io.mosaic import MosaicDataset
    from cubesat_apds_tpu.pipelines.preprocess import preprocess

    img = np.zeros((256, 256), np.float32)
    for _ in range(60):
        cy, cx = rng.integers(10, 220, 2)
        s = int(rng.integers(6, 24))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.2, 1.0)
    rgb8 = (np.stack([img] * 3, -1) * 255).astype(np.uint8)
    for name, sl in (("a", np.s_[:, :128]), ("b", np.s_[:, 128:])):
        Image.fromarray(rgb8[sl]).save(
            str(tmp_path / f"{name}.tif"),
            tiffinfo={33550: (0.001, 0.001, 0.0),
                      33922: (0.0, 0.0, 0.0,
                              10.0 + (0.128 if name == "b" else 0.0),
                              56.0, 0.0)})

    ds = MosaicDataset.from_folder(str(tmp_path))
    cfg = PipelineConfig(akaze=AkazeConfig(capacity=256))
    # dp=1 vs dp=4 run the SAME padded batch shapes — the comparison
    # isolates the dp sharding itself (per-tile math is independent, so
    # the sharded run must be element-wise identical).
    mesh1 = make_mesh(dp=1, tp=8)
    store_ref, stats_ref = preprocess(ds, config=cfg, amount_lod=2,
                                      tile_batch=4, mesh=mesh1)
    mesh = make_mesh(dp=4, tp=2)
    store_dp, stats_dp = preprocess(ds, config=cfg, amount_lod=2,
                                    tile_batch=4, mesh=mesh)
    assert stats_ref.keypoints == stats_dp.keypoints
    assert len(store_ref) == len(store_dp)
    # GSPMD partitioning changes CPU codegen slightly (vector widths per
    # shard) → last-ULP float noise; the keypoint SETS must agree to
    # far-sub-pixel tolerance and descriptors near-bit-exactly.
    np.testing.assert_array_equal(store_ref._kp["image_id"],
                                  store_dp._kp["image_id"])
    for f in ("x", "y"):
        np.testing.assert_allclose(store_ref._kp[f], store_dp._kp[f],
                                   atol=1e-3)
    np.testing.assert_allclose(store_ref._kp["response"],
                               store_dp._kp["response"], rtol=1e-4)
    same = store_ref._desc == store_dp._desc
    assert same.mean() > 0.999, same.mean()


def test_sharded_blockwise_1m_packed_matches_single_device(rng):
    """Production-scale shard-boundary arithmetic: 1,048,576 PACKED
    descriptor rows tp-sharded over 8 devices, blockwise inside each
    shard — exact agreement (distances, winners, tie-breaks) with the
    single-device packed blockwise pass (VERDICT r2 next #6 /
    BASELINE config 4)."""
    import jax.numpy as jnp

    from cubesat_apds_tpu.parallel.sharded_match import (
        make_sharded_knn2_blockwise)

    mesh = make_mesh(dp=1, tp=8)
    M_total = 1 << 20
    q = _rand_desc(rng, 32)
    db = rng.integers(0, 256, (M_total, DESC_BYTES), dtype=np.uint8)
    # Planted structure: exact query copies deep in shards 3 and 7 (the
    # copy at the LOWER global index must win), plus masked holes.
    db[420_000] = q[0]
    db[950_000] = q[0]
    db[777_216] = q[1]
    valid = np.ones(M_total, bool)
    valid[::97] = False
    valid[420_000] = valid[950_000] = valid[777_216] = True

    qb = M.unpack_bits(q)
    dbj = jnp.asarray(db)
    vj = jnp.asarray(valid)
    ref = [np.asarray(x) for x in M.knn2_blockwise(qb, dbj, 65536, vj)]
    fn = make_sharded_knn2_blockwise(mesh, block=32768)
    got = [np.asarray(x) for x in fn(qb, dbj, vj)]
    np.testing.assert_array_equal(ref[0], got[0])
    np.testing.assert_array_equal(ref[1], got[1])
    np.testing.assert_array_equal(ref[2], got[2])
    assert got[0][0] == 0 and got[2][0] == 420_000
    assert got[0][1] == 0 and got[2][1] == 777_216


def test_sharded_fused_kernel_matches_blockwise(rng):
    """make_sharded_knn2_fused (per-shard fused Pallas kNN-2, interpreter
    mode off-TPU) must agree bit-for-bit with the sharded blockwise scan
    and the single-device reference, including cross-shard tie-breaks and
    validity holes."""
    from cubesat_apds_tpu.parallel.sharded_match import (
        make_sharded_knn2_blockwise, make_sharded_knn2_fused)

    mesh = make_mesh(dp=1, tp=8)
    M_total = 8 * 1024
    q = _rand_desc(rng, 32)
    db = rng.integers(0, 256, (M_total, DESC_BYTES), dtype=np.uint8)
    db[1_500] = q[0]                       # shard 1
    db[6_900] = q[0]                       # shard 6 — higher index loses
    valid = np.ones(M_total, bool)
    valid[::13] = False
    valid[1_500] = valid[6_900] = True

    qb = M.unpack_bits(q)
    dbj = jnp.asarray(db)
    vj = jnp.asarray(valid)
    ref = [np.asarray(x) for x in M.knn2(qb, M.unpack_bits(db), db_valid=vj)]
    fn = make_sharded_knn2_fused(mesh, db_block=256)
    got = [np.asarray(x) for x in fn(qb, dbj, vj)]
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
    assert got[0][0] == 0 and got[2][0] == 1_500

    scan = make_sharded_knn2_blockwise(mesh, block=512)
    got2 = [np.asarray(x) for x in scan(qb, dbj, vj)]
    for g, g2 in zip(got, got2):
        np.testing.assert_array_equal(g, g2)


def test_batch_localizer_fused_matches_scan(rng):
    """The serve step with the fused per-shard kernel (interpreter mode
    off-TPU) must agree with the GSPMD unpacked-matmul path — same
    matches, same homographies — on a dp=2 × tp=4 mesh."""
    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, RansacConfig)
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.parallel.serve import (
        make_batch_localizer, shard_device_db)
    from cubesat_apds_tpu.pipelines.localize import DeviceDb

    cam = CameraModel.ideal(100.0, 100.0, 64.0, 64.0)
    base = np.zeros((128, 128), np.float32)
    for _ in range(25):
        cy, cx = rng.integers(5, 100, 2)
        s = int(rng.integers(8, 20))
        base[cy:cy + s, cx:cx + s] = rng.uniform(0.3, 1.0)
    frames = jnp.asarray(
        np.stack([np.roll(base, i, axis=1) for i in range(4)]))

    m = 1000   # deliberately NOT a tp multiple (pad path)
    db = DeviceDb(
        descriptors=jnp.asarray(_rand_desc(rng, m)),
        xy=jnp.asarray(rng.uniform(0, 128, (m, 2)).astype(np.float32)),
        valid=jnp.ones(m, bool),
        obj_points=jnp.zeros((m, 3), jnp.float32), has_world=False)

    mesh = make_mesh(dp=2, tp=4)
    db_sh = shard_device_db(mesh, db)
    outs = {}
    for kernel in ("scan", "fused"):
        cfg = PipelineConfig(
            akaze=AkazeConfig(capacity=256),
            match=MatchConfig(ratio=0.75, kernel=kernel),
            ransac=RansacConfig(num_hypotheses=64))
        step = make_batch_localizer(mesh, cam, cfg, solve_pose=False)
        with jax.set_mesh(mesh):
            outs[kernel] = step(frames, db_sh)

    (h_s, _, nm_s, nk_s), (h_f, _, nm_f, nk_f) = outs["scan"], outs["fused"]
    np.testing.assert_array_equal(np.asarray(nm_s), np.asarray(nm_f))
    np.testing.assert_array_equal(np.asarray(nk_s), np.asarray(nk_f))
    np.testing.assert_array_equal(np.asarray(h_s.ok), np.asarray(h_f.ok))
    np.testing.assert_allclose(np.asarray(h_s.H), np.asarray(h_f.H),
                               atol=1e-5)
