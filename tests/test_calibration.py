"""Calibration tests: Zhang closed-form + LM, chessboard detection.

Mirrors the calibrator binary's contract (reference: calibrator/src/
main.rs:27-80): ≥10 views of a planar grid → K (fx, skew, cx, fy, cy) +
distortion + RMS reprojection error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cubesat_apds_tpu.core.config import CalibConfig
from cubesat_apds_tpu.core.camera import distort_normalized
from cubesat_apds_tpu.ops.geometry.calibration import (
    calibrate_camera,
    planar_grid,
)
from cubesat_apds_tpu.ops.geometry.chessboard import find_chessboard_corners
from cubesat_apds_tpu.ops.geometry.rodrigues import rodrigues_to_matrix


NX, NY = 7, 6
K_TRUE = np.array([[600.0, 0.0, 320.0], [0.0, 580.0, 240.0], [0, 0, 1.0]])


def _synth_views(rng, n_views, dist=None, noise=0.0):
    """Render the planar grid under random poses with K_TRUE."""
    obj = np.asarray(planar_grid(NX, NY, square=1.0))
    views = []
    exts = []
    for _ in range(n_views):
        rvec = np.array([rng.normal(0, 0.12), rng.normal(0, 0.12),
                         rng.normal(0, 0.3)])
        R = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec)))
        t = np.array([rng.uniform(-2, -1), rng.uniform(-2, -1),
                      rng.uniform(8, 14)])
        cam = np.concatenate([obj, np.zeros((len(obj), 1))], -1) @ R.T + t
        xy = cam[:, :2] / cam[:, 2:3]
        if dist is not None:
            xy = np.asarray(distort_normalized(jnp.asarray(xy),
                                               jnp.asarray(dist)))
        pix = xy @ np.array([[K_TRUE[0, 0], 0], [0, K_TRUE[1, 1]]]) + \
            K_TRUE[:2, 2]
        if noise:
            pix = pix + rng.normal(0, noise, pix.shape)
        views.append(pix)
        exts.append((rvec, t))
    return obj, np.stack(views).astype(np.float32), exts


def test_calibrate_ideal_views(rng):
    obj, views, _ = _synth_views(rng, 12)
    res = calibrate_camera(jnp.asarray(obj), jnp.asarray(views))
    assert bool(res.ok)
    K = np.asarray(res.camera.K)
    assert K[0, 0] == pytest.approx(600.0, rel=0.01)
    assert K[1, 1] == pytest.approx(580.0, rel=0.01)
    assert K[0, 2] == pytest.approx(320.0, abs=3.0)
    assert K[1, 2] == pytest.approx(240.0, abs=3.0)
    assert float(res.rms) < 0.1


def test_calibrate_with_distortion(rng):
    dist = np.array([0.08, -0.02, 0.0, 0.0, 0.0])
    obj, views, _ = _synth_views(rng, 12, dist=dist)
    res = calibrate_camera(jnp.asarray(obj), jnp.asarray(views),
                           config=CalibConfig(lm_iters=60))
    assert bool(res.ok)
    K = np.asarray(res.camera.K)
    assert K[0, 0] == pytest.approx(600.0, rel=0.02)
    d = np.asarray(res.camera.dist)
    assert d[0] == pytest.approx(0.08, abs=0.02)
    assert float(res.rms) < 0.2


def test_calibrate_noisy(rng):
    obj, views, _ = _synth_views(rng, 14, noise=0.3)
    res = calibrate_camera(jnp.asarray(obj), jnp.asarray(views))
    assert bool(res.ok)
    K = np.asarray(res.camera.K)
    assert K[0, 0] == pytest.approx(600.0, rel=0.03)
    assert float(res.rms) < 1.0


def test_calibrate_masked_view(rng):
    """A garbage view masked out by view_valid must not perturb K —
    fixing the reference quirk of passing failed detections through."""
    obj, views, _ = _synth_views(rng, 12)
    views_bad = views.copy()
    views_bad[3] = rng.uniform(0, 640, views[3].shape)
    vv = np.ones(12, bool)
    vv[3] = False
    res = calibrate_camera(jnp.asarray(obj), jnp.asarray(views_bad),
                           view_valid=jnp.asarray(vv))
    assert bool(res.ok)
    K = np.asarray(res.camera.K)
    assert K[0, 0] == pytest.approx(600.0, rel=0.02)


def _render_board(H=240, W=320, cell=24, bx=16, by=6, nx=NX, ny=NY):
    """Synthetic checkerboard with (nx, ny) INNER corners at
    (bx + (i+1)·cell, by + (j+1)·cell)."""
    img = np.full((H, W), 0.9, np.float32)
    for r in range(ny + 1):
        for c in range(nx + 1):
            shade = 0.1 if (r + c) % 2 == 0 else 0.9
            img[by + r * cell:by + (r + 1) * cell,
                bx + c * cell:bx + (c + 1) * cell] = shade
    return img


def test_chessboard_detection():
    img = _render_board()
    corners, found = find_chessboard_corners(jnp.asarray(img), NX, NY)
    assert bool(found)
    c = np.asarray(corners).reshape(NY, NX, 2)
    # Inner corner (i, j) sits BETWEEN pixels, at
    # (16 + (i+1)·24 − 0.5, 6 + (j+1)·24 − 0.5).
    for j in range(NY):
        for i in range(NX):
            assert c[j, i, 0] == pytest.approx(39.5 + i * 24, abs=1.0)
            assert c[j, i, 1] == pytest.approx(29.5 + j * 24, abs=1.0)


def test_chessboard_not_found_on_blank():
    img = jnp.full((240, 320), 0.5, jnp.float32)
    _, found = find_chessboard_corners(img, NX, NY)
    assert not bool(found)


def test_chessboard_detection_perspective_warps():
    """Boards are NEVER axis-aligned in real calibration imagery: the
    detector must recover grids under perspective (cv2 handles these;
    found round 2 via the TPU CLI drive — boundary pseudo-saddles broke
    the 4-corner initialization, chessboard.py `strong` gate)."""
    rng = np.random.default_rng(5)
    base = _render_board(H=400, W=440, cell=40, bx=60, by=60)
    n_found = 0
    for k in range(6):
        jitter = rng.uniform(-0.12, 0.12, (4, 2)) * [440, 400]
        src = np.array([[0, 0], [440, 0], [440, 400], [0, 400]],
                       np.float64) + jitter
        dst = np.array([[0, 0], [440, 0], [440, 400], [0, 400]], np.float64)
        A, b = [], []
        for (x, y), (u, v) in zip(dst, src):
            A.append([x, y, 1, 0, 0, 0, -u * x, -u * y]); b.append(u)
            A.append([0, 0, 0, x, y, 1, -v * x, -v * y]); b.append(v)
        coeffs = np.linalg.solve(np.array(A), np.array(b))
        from PIL import Image
        warped = Image.fromarray((base * 255).astype(np.uint8)).transform(
            (440, 400), Image.PERSPECTIVE, coeffs, Image.BICUBIC,
            fillcolor=int(0.9 * 255))
        img = np.asarray(warped, np.float32) / 255.0
        corners, found = find_chessboard_corners(jnp.asarray(img), NX, NY)
        n_found += bool(found)
    assert n_found >= 5, f"only {n_found}/6 warped boards detected"


def test_calibrate_from_images_guards(rng):
    """The reference's >=10-image assert (calibrator main.rs:30-34) and
    the too-few-detections refusal both raise with clear messages."""
    from cubesat_apds_tpu.pipelines.calibrate import calibrate_from_images

    blank = [np.zeros((64, 64), np.float32) for _ in range(3)]
    with pytest.raises(ValueError, match="needs >= "):
        calibrate_from_images(blank, (7, 6))
    blanks = [np.zeros((64, 64), np.float32) for _ in range(12)]
    with pytest.raises(ValueError, match="detectable"):
        calibrate_from_images(blanks, (7, 6))


# ---- photometric robustness (VERDICT r3 next #7) -------------------------
# The regimes CALIB_CB_ADAPTIVE_THRESH exists for (reference:
# calibrator/src/main.rs:44-55): vignetting, sensor noise, motion blur,
# low contrast, cluttered backgrounds — alone and combined with
# perspective. Gates validated: the balance rescue (photometric dips)
# and the 16-combination extreme init (clutter pseudo-corners).


def _degradations(img, rng):
    H, W = img.shape
    yy, xx = np.mgrid[0:H, 0:W]
    r2 = (((xx - W / 2) ** 2 + (yy - H / 2) ** 2)
          / ((W / 2) ** 2 + (H / 2) ** 2))

    def mblur(im, k=5):
        ker = np.ones(k) / k
        return np.apply_along_axis(
            lambda r: np.convolve(r, ker, mode="same"), 1, im)

    def clutter(im):
        out = im.copy()
        for _ in range(30):
            cy = rng.integers(0, H - 20)
            cx = rng.integers(0, W - 20)
            s = int(rng.integers(8, 30))
            if cy < 40 or cy > H - 60 or cx < 40 or cx > W - 50:
                out[cy:cy + s, cx:cx + s] = rng.uniform(0, 1)
        return out

    return {
        "vignette": img * (1.0 - 0.75 * r2).astype(np.float32),
        "noise": np.clip(img + rng.normal(0, 0.04, img.shape),
                         0, 1).astype(np.float32),
        "shot": np.clip(img + rng.normal(0, 1, img.shape)
                        * np.sqrt(np.clip(img, 0, 1)) * 0.06,
                        0, 1).astype(np.float32),
        "mblur": mblur(img).astype(np.float32),
        "lowcontrast": (0.45 + 0.18 * img).astype(np.float32),
        "clutter": clutter(img).astype(np.float32),
        "combo": np.clip(clutter(img) * (1.0 - 0.55 * r2)
                         + rng.normal(0, 0.03, img.shape),
                         0, 1).astype(np.float32),
    }


def test_chessboard_photometric_degradations():
    """Axis-aligned board under every degradation: found, ≤1 px."""
    rng = np.random.default_rng(1)
    base = _render_board(H=400, W=440, cell=40, bx=60, by=60)
    gt = np.array([[60 + (i + 1) * 40 - 0.5, 60 + (j + 1) * 40 - 0.5]
                   for j in range(NY) for i in range(NX)], np.float32)
    for name, img in _degradations(base, rng).items():
        corners, found = find_chessboard_corners(jnp.asarray(img), NX, NY)
        assert bool(found), f"{name}: board not found"
        err = np.linalg.norm(np.asarray(corners) - gt, axis=1)
        assert err.max() < 1.0, f"{name}: max corner error {err.max()}"


@pytest.mark.slow
def test_chessboard_perspective_plus_degradations():
    """Perspective-warped boards × degradations: ≥5/6 found per
    condition (measured: 6/6 on every condition — the bound leaves one
    board of slack for platform tie-order differences), ≤1 px vs the
    warped ground truth when found."""
    from PIL import Image

    rng = np.random.default_rng(5)
    base = _render_board(H=400, W=440, cell=40, bx=60, by=60)
    gt = np.array([[60 + (i + 1) * 40 - 0.5, 60 + (j + 1) * 40 - 0.5]
                   for j in range(NY) for i in range(NX)], np.float64)
    for cond in ("vignette", "clutter", "combo"):
        n_found = 0
        for k in range(6):
            rng2 = np.random.default_rng(100 + k)
            jitter = rng2.uniform(-0.12, 0.12, (4, 2)) * [440, 400]
            src = np.array([[0, 0], [440, 0], [440, 400], [0, 400]],
                           np.float64) + jitter
            dst = np.array([[0, 0], [440, 0], [440, 400], [0, 400]],
                           np.float64)
            A, b = [], []
            for (x, y), (u, v) in zip(dst, src):
                A.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
                b.append(u)
                A.append([0, 0, 0, x, y, 1, -v * x, -v * y])
                b.append(v)
            coeffs = np.linalg.solve(np.array(A), np.array(b))
            warped = Image.fromarray(
                (base * 255).astype(np.uint8)).transform(
                (440, 400), Image.PERSPECTIVE, coeffs, Image.BICUBIC,
                fillcolor=int(0.9 * 255))
            img = np.asarray(warped, np.float32) / 255.0
            rngk = np.random.default_rng(1000 + k)
            img = _degradations(img, rngk)[cond]
            corners, found = find_chessboard_corners(
                jnp.asarray(img), NX, NY)
            if not bool(found):
                continue
            n_found += 1
            Hm = np.array([[coeffs[0], coeffs[1], coeffs[2]],
                           [coeffs[3], coeffs[4], coeffs[5]],
                           [coeffs[6], coeffs[7], 1.0]])
            g = np.concatenate([gt, np.ones((len(gt), 1))], 1) \
                @ np.linalg.inv(Hm).T
            g = g[:, :2] / g[:, 2:]
            err = np.linalg.norm(np.asarray(corners) - g, axis=1)
            assert err.max() < 1.0, f"{cond} k={k}: {err.max()} px"
        assert n_found >= 5, f"{cond}: only {n_found}/6 found"
