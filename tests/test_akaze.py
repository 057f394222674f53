"""AKAZE tests: scale-space invariants, detection behavior, descriptor
properties — synthetic fixtures (the reference's golden GeoTIFFs are not in
the snapshot; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.ops.features import scale_space as S
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute


CFG = AkazeConfig(capacity=512)


def _checker(n=256, cell=32):
    y, x = np.mgrid[0:n, 0:n]
    img = (((y // cell) + (x // cell)) % 2).astype(np.float32)
    return img


def _corners_img(rng, n=256, k=12):
    """Image with random bright squares — corner-rich, AKAZE-friendly."""
    img = np.zeros((n, n), np.float32)
    for _ in range(k):
        cy, cx = rng.integers(30, n - 60, 2)
        s = int(rng.integers(12, 30))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.4, 1.0)
    return img


def test_fed_tau_schedule():
    taus = S.fed_tau_by_process_time(5.0)
    assert (taus > 0).all()
    # The schedule must cover the requested diffusion time.
    assert taus.sum() == pytest.approx(5.0, rel=1e-5)
    # Stability: individual steps can exceed tau_max (that is the point of
    # FED) but the first/smallest stays below it.
    assert taus.min() < 0.25 + 1e-6


def test_evolution_metadata():
    meta = S.evolution_metadata(CFG)
    assert len(meta) == 16
    assert meta[0].esigma == pytest.approx(1.6)
    assert meta[0].octave == 0 and meta[15].octave == 3
    # σ doubles per octave.
    assert meta[4].esigma == pytest.approx(2 * meta[0].esigma)
    # time = σ²/2
    assert meta[3].etime == pytest.approx(0.5 * meta[3].esigma**2)


def test_diffusion_preserves_constant():
    img = jnp.full((64, 64), 0.5, jnp.float32)
    g = jnp.ones((64, 64), jnp.float32)
    out = S.fed_cycle(img, g, S.fed_tau_by_process_time(2.0))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_diffusion_smooths_noise(rng):
    img = jnp.asarray(rng.uniform(0, 1, (64, 64)), jnp.float32)
    g = jnp.ones_like(img) * 0.5
    out = np.asarray(S.fed_cycle(img, g, S.fed_tau_by_process_time(2.0)))
    assert out.std() < np.asarray(img).std()
    # Diffusion conserves total mass (Neumann boundary).
    assert out.mean() == pytest.approx(float(np.asarray(img).mean()), abs=1e-5)


def test_pm_g2_range(rng):
    lx = jnp.asarray(rng.normal(0, 1, (32, 32)), jnp.float32)
    ly = jnp.asarray(rng.normal(0, 1, (32, 32)), jnp.float32)
    g = np.asarray(S.pm_g2(lx, ly, 1.0))
    assert (g > 0).all() and (g <= 1).all()
    # Flat regions diffuse freely (g→1), edges block (g→0).
    assert float(S.pm_g2(jnp.zeros(()), jnp.zeros(()), 1.0)) == 1.0


def test_kcontrast_positive(rng):
    img = jnp.asarray(rng.uniform(0, 1, (128, 128)), jnp.float32)
    k = float(S.compute_k_percentile(img))
    assert k > 0


def test_scale_space_shapes():
    img = jnp.asarray(_checker(128), jnp.float32)
    ss = S.build_scale_space(img, CFG)
    assert len(ss.Lt) == 16
    assert ss.Lt[0].shape == (128, 128)
    assert ss.Lt[4].shape == (64, 64)    # octave 1
    assert ss.Lt[12].shape == (16, 16)   # octave 3
    # Sublevels within an octave keep the octave's shape.
    assert ss.Lt[5].shape == (64, 64)


def test_detect_finds_corners(rng):
    img = _corners_img(rng)
    feats = detect_and_compute(img, CFG)
    n = int(feats.keypoints.count())
    assert n >= 10, f"expected corner detections, got {n}"
    kxy = np.asarray(feats.keypoints.xy)[np.asarray(feats.keypoints.valid)]
    assert (kxy >= 0).all()
    assert (kxy[:, 0] < 256).all() and (kxy[:, 1] < 256).all()


def test_detect_blank_image_finds_nothing():
    img = jnp.full((128, 128), 0.5, jnp.float32)
    feats = detect_and_compute(img, CFG)
    assert int(feats.keypoints.count()) == 0


def test_response_sorted_and_capacity(rng):
    img = _corners_img(rng)
    feats = detect_and_compute(img, CFG)
    resp = np.asarray(feats.keypoints.response)
    valid = np.asarray(feats.keypoints.valid)
    assert valid.shape == (512,)
    # Valid entries form a prefix and are response-descending (the store's
    # ORDER BY response DESC contract, keypointdb.rs:45).
    nv = valid.sum()
    assert valid[:nv].all() and not valid[nv:].any()
    assert (np.diff(resp[:nv]) <= 1e-7).all()


def test_descriptors_discriminative(rng):
    """Keypoints far apart should have different descriptors; the same
    image processed twice must give identical output (determinism)."""
    img = _corners_img(rng)
    f1 = detect_and_compute(img, CFG)
    f2 = detect_and_compute(img, CFG)
    np.testing.assert_array_equal(np.asarray(f1.descriptors),
                                  np.asarray(f2.descriptors))
    valid = np.asarray(f1.keypoints.valid)
    d = np.asarray(f1.descriptors)[valid]
    if len(d) >= 2:
        # Not all descriptors identical.
        assert np.unpackbits(d[0] ^ d[1]).sum() > 0


def test_batched_equals_single(rng):
    """vmapped detect_and_compute (detect_and_compute_batch — preprocess
    tile batches, micro-batched streaming, dp serving) must be BIT-EXACT
    per frame vs single-frame calls, in both descriptor modes. Guards
    the custom-vmap flat_take rule (batch axis linearized into the
    single-dim gather) against semantic drift."""
    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute_batch

    img1 = _corners_img(rng)
    img2 = np.roll(img1, 9, axis=0)
    for mode in ("exact", "fast", "hybrid"):
        cfg = AkazeConfig(capacity=256, descriptor_mode=mode)
        f1 = detect_and_compute(img1, cfg)
        f2 = detect_and_compute(img2, cfg)
        fb = detect_and_compute_batch(np.stack([img1, img2]), cfg)
        for single, b in ((f1, 0), (f2, 1)):
            np.testing.assert_array_equal(
                np.asarray(fb.descriptors[b]), np.asarray(single.descriptors),
                err_msg=f"mode={mode} frame={b}")
            np.testing.assert_array_equal(
                np.asarray(fb.keypoints.valid[b]),
                np.asarray(single.keypoints.valid))
            np.testing.assert_allclose(
                np.asarray(fb.keypoints.xy[b]),
                np.asarray(single.keypoints.xy), atol=1e-5)


def test_adaptive_buckets_equals_full(rng):
    """The adaptive capacity ladder (lax.switch over response-sorted
    valid-prefix sizes, ops/features/akaze.py) must be BIT-EXACT vs the
    single full-capacity branch in both descriptor modes — the switch
    only skips slots that are masked zeros either way."""
    img = _corners_img(rng, n=256, k=24)
    # hybrid is omitted: it takes the same combined-stack branch of
    # _orient_describe as fast, and its 3 extra pyramids double this
    # test's compile time for no new ladder coverage.
    for mode in ("exact", "fast"):
        cfg_a = AkazeConfig(capacity=1024, descriptor_mode=mode,
                            adaptive_buckets=4)
        cfg_f = AkazeConfig(capacity=1024, descriptor_mode=mode,
                            adaptive_buckets=1)
        fa = detect_and_compute(img, cfg_a)
        ff = detect_and_compute(img, cfg_f)
        valid = np.asarray(ff.keypoints.valid)
        nv = valid.sum()
        # The switch exercises a non-trivial rung: count below capacity.
        assert 0 < nv < 1024
        np.testing.assert_array_equal(
            np.asarray(fa.keypoints.valid), valid, err_msg=f"mode={mode}")
        np.testing.assert_array_equal(
            np.asarray(fa.descriptors), np.asarray(ff.descriptors),
            err_msg=f"mode={mode}")
        np.testing.assert_array_equal(
            np.asarray(fa.keypoints.angle), np.asarray(ff.keypoints.angle),
            err_msg=f"mode={mode}")


def test_matching_shifted_image(rng):
    """End-to-end invariance: a translated copy must match heavily and
    the matched displacement must equal the shift."""
    from cubesat_apds_tpu.ops.match import knn_match, matched_points

    base = _corners_img(rng, n=256, k=16)
    shift = 8
    moved = np.roll(base, (shift, shift), axis=(0, 1))
    f1 = detect_and_compute(base, CFG)
    f2 = detect_and_compute(moved, CFG)
    m = knn_match(f1.descriptors, f2.descriptors, ratio=0.7,
                  q_valid=f1.keypoints.valid, db_valid=f2.keypoints.valid)
    ok = np.asarray(m.valid)
    assert ok.sum() >= 8, f"only {ok.sum()} matches"
    qp, tp = matched_points(f1.keypoints.xy, f2.keypoints.xy, m)
    disp = np.asarray(tp)[ok] - np.asarray(qp)[ok]
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, [shift, shift], atol=1.0)


def test_fast_descriptor_mode(rng):
    """Fast (blur-matched single-sample) descriptors: valid, deterministic,
    discriminative, and close to the exact-mode descriptors."""
    from cubesat_apds_tpu.ops.match import knn_match, matched_points

    base = _corners_img(rng, n=256, k=16)
    cfg_fast = AkazeConfig(capacity=512, descriptor_mode="fast")
    f1 = detect_and_compute(base, cfg_fast)
    # Keypoints identical to exact mode (detection unchanged).
    f_exact = detect_and_compute(base, AkazeConfig(capacity=512))
    np.testing.assert_array_equal(np.asarray(f1.keypoints.xy),
                                  np.asarray(f_exact.keypoints.xy))
    v = np.asarray(f1.keypoints.valid)
    # Fast and exact descriptors agree on most bits (same construction,
    # anti-aliased sampling).
    d_f = np.asarray(f1.descriptors)[v]
    d_e = np.asarray(f_exact.descriptors)[v]
    flips = np.unpackbits(d_f ^ d_e, axis=-1).sum(-1)
    assert np.median(flips) < 90, f"median flips {np.median(flips)}/486"

    # End-to-end: shifted-image matching still works in fast mode.
    moved = np.roll(base, (6, 6), axis=(0, 1))
    f2 = detect_and_compute(moved, cfg_fast)
    m = knn_match(f1.descriptors, f2.descriptors, ratio=0.7,
                  q_valid=f1.keypoints.valid, db_valid=f2.keypoints.valid)
    ok = np.asarray(m.valid)
    assert ok.sum() >= 8
    qp, tp = matched_points(f1.keypoints.xy, f2.keypoints.xy, m)
    disp = np.asarray(tp)[ok] - np.asarray(qp)[ok]
    np.testing.assert_allclose(np.median(disp, axis=0), [6, 6], atol=1.0)


def test_detect_and_compute_tiled_matches_monolithic(rng):
    """Tiled extraction (the ≥4096px path): full-frame coordinates,
    no seam duplicates, and keypoint agreement with the monolithic
    pipeline away from tile seams."""
    from scipy.spatial import cKDTree

    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute_tiled

    img = _corners_img(rng, n=384, k=30)
    mono = detect_and_compute(jnp.asarray(img), CFG)
    tiled = detect_and_compute_tiled(img, CFG, tile=256, overlap=64,
                                     tile_batch=2)

    mv = np.asarray(mono.keypoints.valid)
    tv = np.asarray(tiled.keypoints.valid)
    mxy = np.asarray(mono.keypoints.xy)[mv]
    txy = np.asarray(tiled.keypoints.xy)[tv]
    assert tv.sum() > 0
    # All tiled keypoints inside the image frame.
    assert (txy[:, 0] >= 0).all() and (txy[:, 0] < 384).all()
    assert (txy[:, 1] >= 0).all() and (txy[:, 1] < 384).all()
    # No seam duplicates: no pair within 0.1 px at the SAME or adjacent
    # evolution level. (Co-located keypoints ≥2 levels apart are
    # legitimate multi-scale AKAZE output — the 3-D NMS only suppresses
    # adjacent levels — so they are excluded from this check.)
    tlvl = np.asarray(tiled.keypoints.class_id)[tv]
    d, nn = cKDTree(txy).query(txy, k=2)
    close = d[:, 1] <= 0.1
    assert (np.abs(tlvl[close] - tlvl[nn[close, 1]]) >= 2).all()
    # Strong monolithic keypoints away from seams are recovered.
    resp = np.asarray(mono.keypoints.response)[mv]
    strong = resp > np.percentile(resp, 50)
    seam = np.abs(mxy[:, 0] - 192) < 40
    seam |= np.abs(mxy[:, 1] - 192) < 40
    probe = mxy[strong & ~seam]
    if len(probe):
        d, _ = cKDTree(txy).query(probe, k=1)
        assert (d < 1.0).mean() > 0.9, f"recovered {(d < 1.0).mean():.2f}"


def test_tiled_matches_monolithic_64k_capacity(rng):
    """Device-resident tiled merge at ≥64k capacity (VERDICT r3 item 2):
    a dense 1024² texture, capacity 65,536 — the vectorized grid-hash
    seam dedup and the top-K plumbing must hold at scale: no same-or-
    adjacent-level duplicates, and near-total recovery of monolithic
    keypoints away from seams."""
    from scipy import ndimage
    from scipy.spatial import cKDTree

    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute_tiled

    n = 1024
    img = np.zeros((n, n), np.float64)
    for octv in range(1, 7):
        s = n >> octv
        layer = ndimage.zoom(rng.random((s, s)), n / s, order=3)
        img += layer[:n, :n] / (2.0 ** octv)
    img = ((img - img.min()) / (img.max() - img.min())).astype(np.float32)

    cap = 65536
    mono = detect_and_compute(jnp.asarray(img), CFG, capacity=cap)
    tiled = detect_and_compute_tiled(img, CFG, capacity=cap, tile=512,
                                     overlap=64, tile_batch=2)

    mv = np.asarray(mono.keypoints.valid)
    tv = np.asarray(tiled.keypoints.valid)
    assert tv.sum() > 2000, int(tv.sum())
    txy = np.asarray(tiled.keypoints.xy)[tv]
    tlvl = np.asarray(tiled.keypoints.class_id)[tv]
    # No seam duplicates at scale.
    d, nn = cKDTree(txy).query(txy, k=2)
    close = d[:, 1] <= 0.1
    assert (np.abs(tlvl[close] - tlvl[nn[close, 1]]) >= 2).all()
    # Monolithic keypoints away from seams are recovered. Seam bands:
    # tile boundaries at x,y ∈ {448..512, 896..960} ± margin.
    mxy = np.asarray(mono.keypoints.xy)[mv]
    seam = np.zeros(len(mxy), bool)
    for c in (480.0, 928.0):
        seam |= np.abs(mxy[:, 0] - c) < 48
        seam |= np.abs(mxy[:, 1] - c) < 48
    probe = mxy[~seam]
    d, _ = cKDTree(txy).query(probe, k=1)
    assert (d < 1.0).mean() > 0.95, f"recovered {(d < 1.0).mean():.3f}"


def test_tiled_merge_seam_dedup_is_greedy():
    """Seam dedup must match greedy rank-order suppression: a candidate
    whose only stronger neighbor is ITSELF suppressed survives (kill
    sets are recomputed per round, not accumulated). Chain A>B>C>D with
    adjacent pairs within 0.5 px: greedy keeps {A, C}."""
    from cubesat_apds_tpu.core.config import DESC_BYTES
    from cubesat_apds_tpu.ops.features.akaze import _tiled_merge

    n = 4
    xy = jnp.asarray([[10.0, 10.0], [10.4, 10.0],
                      [10.8, 10.0], [11.2, 10.0]], jnp.float32)
    response = jnp.asarray([4.0, 3.0, 2.0, 1.0], jnp.float32)
    zeros_f = jnp.zeros(n, jnp.float32)
    zeros_i = jnp.zeros(n, jnp.int32)
    desc = jnp.tile(jnp.arange(n, dtype=jnp.uint8)[:, None],
                    (1, DESC_BYTES))
    out = _tiled_merge(xy, zeros_f + 4.8, zeros_f, response, zeros_i,
                       zeros_i, desc, jnp.ones(n, bool),
                       img_h=32, img_w=32, capacity=4)
    kp = out.keypoints
    kept_x = sorted(np.asarray(kp.xy[kp.valid, 0]).tolist())
    np.testing.assert_allclose(kept_x, [10.0, 10.8], atol=1e-5)
    # Descriptors must follow their keypoints through the merge.
    kept_desc = np.asarray(out.descriptors[kp.valid, 0])
    assert sorted(kept_desc.tolist()) == [0, 2]


def test_tiled_merge_matches_numpy_greedy(rng):
    """The Jacobi top-2 candidate-space formulation must reproduce
    brute-force greedy rank-order suppression on seam-shaped scenes —
    isolated points, sub-0.5-px pairs/triples across adjacent levels,
    and 4-chains at 0.4-px spacing (the densest topologies tile seams
    can produce; in-tile 3-D NMS bounds anything denser)."""
    from cubesat_apds_tpu.core.config import DESC_BYTES
    from cubesat_apds_tpu.ops.features.akaze import _tiled_merge

    H = W = 256
    pts, cls = [], []
    for _ in range(40):                       # isolated
        pts.append(rng.uniform(2, W - 2, 2))
        cls.append(int(rng.integers(0, 12)))
    for _ in range(25):                       # 0.3-px clusters, ±1 level
        c = rng.uniform(2, W - 2, 2)
        lv = int(rng.integers(1, 11))
        for _j in range(int(rng.integers(2, 4))):
            pts.append(c + rng.uniform(-0.15, 0.15, 2))
            cls.append(lv + int(rng.integers(-1, 2)))
    for _ in range(10):                       # 4-chains at 0.4-px pitch
        c = rng.uniform(4, W - 4, 2)
        d = rng.uniform(-1, 1, 2)
        d = 0.4 * d / np.linalg.norm(d)
        lv = int(rng.integers(1, 11))
        for j in range(4):
            pts.append(c + j * d)
            cls.append(lv)
    n = len(pts)
    xy = np.asarray(pts, np.float32)
    cls_a = np.asarray(cls, np.int32)
    resp = (rng.permutation(n) + 1.0).astype(np.float32)  # distinct
    valid = rng.uniform(size=n) < 0.9

    kept: list = []                           # brute-force greedy
    for i in np.argsort(-resp, kind="stable"):
        if not valid[i]:
            continue
        if not any(np.sum((xy[i] - xy[j]) ** 2) < 0.25
                   and abs(int(cls_a[i]) - int(cls_a[j])) <= 1
                   for j in kept):
            kept.append(i)
    expected = {(round(float(xy[j, 0]), 3), round(float(xy[j, 1]), 3))
                for j in kept}

    desc = np.tile((np.arange(n) % 256).astype(np.uint8)[:, None],
                   (1, DESC_BYTES))
    zeros = jnp.zeros(n, jnp.float32)
    out = _tiled_merge(jnp.asarray(xy), zeros, zeros, jnp.asarray(resp),
                       jnp.asarray(cls_a), jnp.asarray(cls_a),
                       jnp.asarray(desc), jnp.asarray(valid),
                       img_h=H, img_w=W, capacity=n)
    kp = out.keypoints
    got_xy = np.asarray(kp.xy[kp.valid])
    got = {(round(float(p[0]), 3), round(float(p[1]), 3)) for p in got_xy}
    assert got == expected


def test_hybrid_descriptor_mode(rng):
    """Hybrid (2×2 blur-matched subcell) descriptors: detection
    unchanged, strictly closer to exact than fast mode, and the static
    subcell geometry reproduces each cell's discrete mean position."""
    from cubesat_apds_tpu.ops.features.mldb import (_CELL_CENTERS,
                                                    _subcell)

    # Weighted subcell centers == the fast mode's cell centers (the
    # discrete mean sample position of every cell), per grid and per
    # subdivision.
    for sub in (2, 3):
        for g in range(3):
            _, cc = _CELL_CENTERS[g]
            _, centers, weights, m = _subcell(sub)[g]
            n_cells = len(cc)
            c4 = centers.reshape(n_cells, m * m, 2)
            w4 = weights.reshape(n_cells, m * m, 1)
            np.testing.assert_allclose((c4 * w4).sum(1), cc, atol=1e-5)
            np.testing.assert_allclose(w4.sum(1), 1.0, atol=1e-6)

    base = _corners_img(rng, n=256, k=16)
    f_e = detect_and_compute(base, AkazeConfig(capacity=512))
    f_h = detect_and_compute(base, AkazeConfig(capacity=512,
                                               descriptor_mode="hybrid"))
    f_f = detect_and_compute(base, AkazeConfig(capacity=512,
                                               descriptor_mode="fast"))
    np.testing.assert_array_equal(np.asarray(f_h.keypoints.xy),
                                  np.asarray(f_e.keypoints.xy))
    v = np.asarray(f_e.keypoints.valid)
    d_e = np.asarray(f_e.descriptors)[v]
    flips_h = np.unpackbits(np.asarray(f_h.descriptors)[v] ^ d_e,
                            axis=-1).sum(-1)
    flips_f = np.unpackbits(np.asarray(f_f.descriptors)[v] ^ d_e,
                            axis=-1).sum(-1)
    assert flips_h.mean() < 0.6 * flips_f.mean(), \
        f"hybrid {flips_h.mean():.1f} vs fast {flips_f.mean():.1f}"
    assert np.median(flips_h) < 45, f"median {np.median(flips_h)}/486"


def test_fast_orientation_mode(rng):
    """orientation_mode='fast' (55-point checkerboard subset of the
    109-point disc) must agree with exact orientation for the bulk of
    keypoints — the resultant vector estimate just gets √2 more noise,
    not a different convention."""
    base = _corners_img(rng, n=256, k=16)
    f_e = detect_and_compute(base, AkazeConfig(capacity=512))
    f_f = detect_and_compute(base, AkazeConfig(capacity=512,
                                               orientation_mode="fast"))
    v = np.asarray(f_e.keypoints.valid)
    ae = np.asarray(f_e.keypoints.angle)[v]
    af = np.asarray(f_f.keypoints.angle)[v]
    # circular distance
    d = np.abs(np.angle(np.exp(1j * (ae - af))))
    frac = float((d < 0.2).mean())
    assert frac > 0.8, f"only {frac:.2f} of angles within 0.2 rad"
    assert float(np.median(d)) < 0.05, f"median {np.median(d):.3f} rad"


def test_tiled_merge_refuses_int32_overflow():
    """Seam-dedup cell ids are iy*img_w+ix in int32 (x64 is off on TPU,
    overflow converts silently) — images whose pixel count exceeds
    int32 must be refused loudly, not dedup'd wrong."""
    import jax.numpy as jnp

    from cubesat_apds_tpu.ops.features.akaze import _tiled_merge

    xy = jnp.zeros((4, 2), jnp.float32)
    zf = jnp.zeros(4, jnp.float32)
    zi = jnp.zeros(4, jnp.int32)
    desc = jnp.zeros((4, 61), jnp.uint8)
    with pytest.raises(ValueError, match="int32 seam-dedup"):
        _tiled_merge(xy, zf, zf, zf, zi, zi, desc,
                     jnp.ones(4, bool), 50000, 50000, 4)


def test_batched_ladder_equals_single(rng):
    """detect_and_compute_batch's BATCH-LEVEL capacity ladder (one
    switch outside the vmap, rung = batch max live count) must be
    bit-exact vs per-image single calls — including a batch whose
    images fill different fractions of the capacity (VERDICT r3 next
    #5)."""
    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute_batch

    rich = _corners_img(rng, n=256, k=24)
    # Few keypoints, but RANDOM rectangles — a single perfect square has
    # response-TIED corners, and approx_max_k's tie selection differs
    # between vmapped and single lowerings (pre-existing, both batch
    # implementations; unrelated to the ladder).
    sparse = _corners_img(rng, n=256, k=3)
    batch = np.stack([rich, sparse])
    for mode in ("exact", "fast"):
        cfg = AkazeConfig(capacity=1024, descriptor_mode=mode,
                          adaptive_buckets=4)
        fb = detect_and_compute_batch(batch, cfg)
        for i, img in enumerate((rich, sparse)):
            ref = detect_and_compute(img, cfg)
            np.testing.assert_array_equal(
                np.asarray(fb.keypoints.valid[i]),
                np.asarray(ref.keypoints.valid), err_msg=f"mode={mode}")
            np.testing.assert_array_equal(
                np.asarray(fb.descriptors[i]), np.asarray(ref.descriptors),
                err_msg=f"mode={mode}")
            np.testing.assert_array_equal(
                np.asarray(fb.keypoints.angle[i]),
                np.asarray(ref.keypoints.angle), err_msg=f"mode={mode}")
        counts = np.asarray(fb.keypoints.valid).sum(1)
        assert counts[1] < counts[0] < 1024   # the rung was non-trivial
