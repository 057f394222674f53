"""AKAZE numerical validation against the independent NumPy oracle.

VERDICT round-1 item 3: the TPU AKAZE had no numerical ground truth
(cv2 5.0 dropped AKAZE to contrib; the reference's golden GeoTIFFs are
not in the snapshot). tests/oracle_akaze.py reimplements the published
algorithm (Alcantarilla BMVC'13, OpenCV parameterization — reference
goldens at feature_extraction/src/lib.rs:251-315) with scalar/ndimage
mechanics; these tests pin keypoint-set and descriptor-bit agreement on
synthetic scenes, and quantify the approx_max_k recall loss against the
exact-top-k configuration.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage
from scipy.spatial import cKDTree

import oracle_akaze as oracle
from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute

# The oracle validates the REFERENCE-FAITHFUL sampling: pin exact
# descriptor/orientation modes (the package default is the fast mode,
# whose fidelity is covered by the end-task study instead — PERF.md).
CFG_EXACT = AkazeConfig(capacity=1024, detect_topk="exact",
                        descriptor_mode="exact", orientation_mode="exact")


def _scene_noise(seed=7, n=256, sigma=3.0):
    rng = np.random.default_rng(seed)
    img = ndimage.gaussian_filter(rng.random((n, n)), sigma)
    return ((img - img.min()) / (img.max() - img.min())).astype(np.float32)


def _scene_blocks(seed=3, n=256, k=40):
    rng = np.random.default_rng(seed)
    img = np.zeros((n, n), np.float32)
    for _ in range(k):
        cy, cx = rng.integers(20, n - 56, 2)
        s = int(rng.integers(10, 30))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.3, 1.0)
    return img


def _scene_blobs(seed=3, n=256, k=30):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:n, 0:n]
    img = 0.3 * x / n + 0.2 * y / n
    for _ in range(k):
        cy, cx = rng.integers(20, n - 20, 2)
        s = rng.uniform(2, 8)
        img = img + rng.uniform(-0.5, 0.5) * np.exp(
            -((y - cy) ** 2 + (x - cx) ** 2) / (2 * s * s))
    return ((img - img.min()) / (img.max() - img.min())).astype(np.float32)


def _scene_rotated(seed=3, n=256):
    """Blocks scene rotated 25° (bilinear): every descriptor pattern is
    sampled off-axis — exercises the rotated-lattice conventions
    (oracle ledger #1, #10, #11)."""
    img = ndimage.rotate(_scene_blocks(seed, n), 25.0, reshape=False,
                         order=1, mode="constant")
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _scene_scaled(seed=3, n=256):
    """Blocks scene rescaled ×1.6 and center-cropped: features land
    between the dyadic octaves — exercises cross-level assignment and
    the level-border convention (ledger #7, #8)."""
    big = ndimage.zoom(_scene_blocks(seed, int(n * 1.0)), 1.6, order=1)
    o = (big.shape[0] - n) // 2
    return np.ascontiguousarray(big[o:o + n, o:o + n]).astype(np.float32)


def _scene_texture(seed=5, n=256):
    """Natural-image stand-in: multi-octave 1/f value noise (no bundled
    photo exists offline — scipy.datasets needs network). Dense texture
    at every scale produces near-tie extrema everywhere — exercises the
    NMS tie conventions (ledger #8) and contrast percentile (#5)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((n, n), np.float64)
    for octv in range(1, 6):
        s = n >> octv
        layer = ndimage.zoom(rng.random((s, s)), n / s, order=3)
        img += layer[:n, :n] / (2.0 ** octv)
    return ((img - img.min()) / (img.max() - img.min())).astype(np.float32)


def _jax_features(img, cfg=CFG_EXACT):
    feats = detect_and_compute(jnp.asarray(img), cfg)
    kv = np.asarray(feats.keypoints.valid)
    return (np.asarray(feats.keypoints.xy)[kv],
            np.asarray(feats.keypoints.class_id)[kv],
            np.asarray(feats.descriptors)[kv])


def _coverage(a_xy, a_lvl, b_xy, b_lvl, tol=0.5):
    """Fraction of a-keypoints with a same-level b-keypoint within tol px."""
    if len(a_xy) == 0 or len(b_xy) == 0:
        return 0.0
    d, idx = cKDTree(b_xy).query(a_xy, k=1)
    return float(((d <= tol) & (a_lvl == b_lvl[idx])).mean())


@pytest.mark.parametrize("scene", ["noise", "blocks", "blobs",
                                   "rotated", "scaled", "texture"])
def test_oracle_agreement(scene):
    img = {"noise": _scene_noise, "blocks": _scene_blocks,
           "blobs": _scene_blobs, "rotated": _scene_rotated,
           "scaled": _scene_scaled, "texture": _scene_texture}[scene]()
    kpts_o, desc_o = oracle.detect_and_compute(img)
    jx, jl, jd = _jax_features(img)

    ox = np.array([[k["x"], k["y"]] for k in kpts_o]).reshape(-1, 2)
    ol = np.array([k["level"] for k in kpts_o], np.int64)

    # Keypoint counts within 5% of each other.
    assert len(ox) > 30
    assert abs(len(ox) - len(jx)) / max(len(ox), len(jx)) < 0.05

    # Bidirectional set agreement ≥95% (≤0.5 px, same evolution level).
    cov_o = _coverage(ox, ol, jx, jl)
    cov_j = _coverage(jx, jl, ox, ol)
    assert cov_o >= 0.95, f"oracle→jax coverage {cov_o:.3f}"
    assert cov_j >= 0.95, f"jax→oracle coverage {cov_j:.3f}"

    # Descriptor bits: ≥95% mean agreement over matched pairs.
    d, idx = cKDTree(jx).query(ox, k=1)
    m = (d <= 0.5) & (ol == jl[idx])
    bits_o = np.unpackbits(desc_o[m], axis=1, bitorder="little")[:, :486]
    bits_j = np.unpackbits(jd[idx[m]], axis=1, bitorder="little")[:, :486]
    agree = (bits_o == bits_j).mean(axis=1)
    assert agree.mean() >= 0.95, f"bit agreement {agree.mean():.4f}"
    assert np.median(agree) >= 0.99


def test_approx_topk_recall():
    """Quantify approx_max_k recall loss (VERDICT weak #3): the approx
    configuration must retain ≥95% of the exact-top-k keypoint set and
    identical descriptors on the shared subset."""
    img = _scene_noise(seed=11)
    ex_xy, ex_lvl, ex_desc = _jax_features(img, CFG_EXACT)
    ap_xy, ap_lvl, ap_desc = _jax_features(
        img, AkazeConfig(capacity=1024, detect_topk="approx",
                         descriptor_mode="exact", orientation_mode="exact"))

    d, idx = cKDTree(ap_xy).query(ex_xy, k=1)
    kept = (d <= 1e-3) & (ex_lvl == ap_lvl[idx])
    recall = float(kept.mean())
    assert recall >= 0.95, f"approx_max_k keypoint recall {recall:.3f}"
    # Shared keypoints carry bit-identical descriptors.
    assert (ex_desc[kept] == ap_desc[idx[kept]]).all()
