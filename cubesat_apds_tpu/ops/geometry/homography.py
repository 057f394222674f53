"""Homography estimation: normalized DLT + vectorized RANSAC.

Replaces OpenCV find_homography (RANSAC/LMEDS) as called by
find_homography_mat (reference: homographier/src/homographier/mod.rs:231-259,
default reprojection threshold 3.0 at mod.rs:248).

TPU-native shape: instead of OpenCV's sequential adaptive RANSAC loop, draw
a FIXED batch of H minimal 4-point samples with a seeded PRNG, solve all
hypotheses as one batched 8×9 SVD, score all H×N reprojections as one
einsum, take the argmax — then refine with masked DLT on the winner's
inliers (SURVEY.md §7 hard part #2: inlier-set agreement is the metric, not
bitwise pose equality).
"""

from __future__ import annotations

from cubesat_apds_tpu.ops.geometry.linalg_small import (
    highest_matmul_precision as _highest_matmul_precision)

import functools

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.core.config import RansacConfig
from cubesat_apds_tpu.core.types import HomographyResult


def _normalize_points(pts, weights):
    """Hartley normalization with weights (invalid points get weight 0).

    Returns (normalized pts, 3×3 similarity T) with mean 0 / RMS √2.
    """
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2), 1e-12)
    mean = jnp.sum(pts * w, axis=-2, keepdims=True) / wsum[..., None, :]
    centered = pts - mean
    scale = jnp.sqrt(2.0) / jnp.maximum(
        jnp.sqrt(jnp.sum(jnp.sum(centered**2, -1, keepdims=True) * w, axis=-2)
                 / wsum)[..., 0], 1e-12)
    T = jnp.zeros(pts.shape[:-2] + (3, 3), pts.dtype)
    T = T.at[..., 0, 0].set(scale)
    T = T.at[..., 1, 1].set(scale)
    T = T.at[..., 0, 2].set(-scale * mean[..., 0, 0])
    T = T.at[..., 1, 2].set(-scale * mean[..., 0, 1])
    T = T.at[..., 2, 2].set(1.0)
    return centered * scale[..., None, None], T


@_highest_matmul_precision
def dlt_homography(src, dst, weights=None):
    """Weighted DLT: solve H s.t. dst ~ H·src from ≥4 correspondences.

    src, dst: [..., N, 2]. weights: [..., N] (0 masks a correspondence).
    Returns [..., 3, 3] with H[2,2] = 1 normalization.
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst, src.dtype)
    n = src.shape[-2]
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    else:
        weights = jnp.asarray(weights, src.dtype)
    sn, Ts = _normalize_points(src, weights)
    dn, Td = _normalize_points(dst, weights)
    x, y = sn[..., 0], sn[..., 1]
    u, v = dn[..., 0], dn[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Two rows per correspondence of the 2N×9 design matrix.
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2N, 9]
    wrep = jnp.concatenate([weights, weights], axis=-1)[..., None]
    A = A * wrep
    # Nullspace of A via eigh of AᵀA (9×9 — cheap, batched, TPU-friendly).
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]  # eigenvector of smallest eigenvalue
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # Denormalize: H = Td⁻¹ · Hn · Ts.
    H = jnp.linalg.solve(Td, Hn @ Ts)
    scale = H[..., 2:3, 2:3]
    H = H / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    return H


@_highest_matmul_precision
def dlt_homography_solve(src, dst, weights=None):
    """Fast DLT variant fixing H[2,2] = 1: an 8×8 linear solve instead of
    the 9×9 eigendecomposition (TPU eigh custom-calls cost ~10× an LU
    solve). Used on the RANSAC hot path; degenerate H (true H[2,2] = 0)
    yields a non-finite result that the RANSAC scorer discards.
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst, src.dtype)
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    else:
        weights = jnp.asarray(weights, src.dtype)
    sn, Ts = _normalize_points(src, weights)
    dn, Td = _normalize_points(dst, weights)
    x, y = sn[..., 0], sn[..., 1]
    u, v = dn[..., 0], dn[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # Rows of A·h8 = b with h = [h00..h21], h22 = 1.
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)               # [..., 2N, 8]
    b = jnp.concatenate([u, v], axis=-1)[..., None]      # [..., 2N, 1]
    w2 = jnp.concatenate([weights, weights], axis=-1)[..., None]
    from cubesat_apds_tpu.ops.geometry.linalg_small import cholesky_solve

    Aw = A * w2
    bw = (b * w2)[..., 0]
    AtA = jnp.einsum("...ni,...nj->...ij", Aw, Aw)
    Atb = jnp.einsum("...ni,...n->...i", Aw, bw)
    h8 = cholesky_solve(AtA, Atb, damp=1e-8)
    Hn = jnp.concatenate([h8, jnp.ones(h8.shape[:-1] + (1,), h8.dtype)],
                         axis=-1).reshape(h8.shape[:-1] + (3, 3))
    H = jnp.linalg.solve(Td, Hn @ Ts)
    scale = H[..., 2:3, 2:3]
    return H / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)


def _sample_nondegenerate(p4):
    """[..., 4, 2] minimal samples → [...] bool: all four points
    distinct and no three collinear.

    The guard RANSAC needs against many-to-one match clusters: when
    dozens of queries ratio-match ONE train row (low-entropy or
    adversarial DBs), minimal samples drawing ≥2 cluster members are
    exactly degenerate — duplicate points are bit-identical (d² = 0)
    and triples through ≤2 distinct locations have exactly-zero cross
    products, so tiny absolute thresholds are reliable. A rank-deficient
    H fit through such a sample collapses the plane onto the cluster
    point and scores every cluster match as a zero-error inlier, which
    no forward-transfer or f32-determinant check can reject (det of a
    large-entry rank-1 matrix drowns in cancellation noise)."""
    diff = p4[..., :, None, :] - p4[..., None, :, :]      # [..., 4, 4, 2]
    d2 = jnp.sum(diff * diff, axis=-1)
    eye = jnp.eye(4, dtype=bool)
    distinct = jnp.all(jnp.where(eye, 1.0, d2) > 1e-9, axis=(-2, -1))
    spread = jnp.maximum(jnp.max(d2, axis=(-2, -1)), 1e-12)

    def cross(i, j, k):
        a = p4[..., j, :] - p4[..., i, :]
        b = p4[..., k, :] - p4[..., i, :]
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    noncol = jnp.ones(p4.shape[:-2], bool)
    for (i, j, k) in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
        noncol &= jnp.abs(cross(i, j, k)) > 1e-7 * spread
    return distinct & noncol


def _det3(H):
    """Closed-form [..., 3, 3] determinant (jnp.linalg.det would lower
    to an LU custom-call on TPU — expensive at these sizes, see
    ops/geometry/linalg_small.py)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def symmetric_transfer_error(H, src, dst):
    """Forward reprojection error ||H·src − dst||² per point [..., N]."""
    from cubesat_apds_tpu.ops.warp import apply_homography

    proj = apply_homography(H, src)
    return jnp.sum((proj - dst) ** 2, axis=-1)


@functools.partial(jax.jit, static_argnames=("config", "method"))
@_highest_matmul_precision
def find_homography_ransac(src, dst, valid=None, config: RansacConfig = RansacConfig(),
                           key=None, method: str = "ransac",
                           quality=None) -> HomographyResult:
    """Robust homography from fixed-capacity correspondences.

    src, dst: [N, 2]; valid: [N] bool mask. Returns HomographyResult whose
    inlier mask matches find_homography_mat's RANSAC mask semantics
    (reference: homographier mod.rs:243-256).

    method: "ransac" (inlier-count scoring), "lmeds" (least-median-of-
    squares scoring; inliers from a robust 2.5·MAD-style gate), or "rho"
    (PROSAC-style progressive sampling, the reference's
    HomographyMethod::RHO, mod.rs:25-31) — the three mask-returning
    HomographyMethod variants. For "rho", `quality` [N] ranks the
    correspondences (LOWER is better, e.g. match Hamming distance);
    hypothesis h draws its minimal sample from the top-n_h ranked
    correspondences with n_h growing geometrically from 8 to num_valid —
    the PROSAC progressive-pool schedule recast as a fixed batch (early
    hypotheses concentrate on high-confidence matches, the tail converges
    to uniform RANSAC, preserving its guarantees). Scoring/refinement is
    shared with "ransac". Without `quality`, "rho" degrades to "ransac".
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    n = src.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if key is None:
        key = jax.random.PRNGKey(config.seed)

    num_valid = jnp.sum(valid.astype(jnp.int32))
    vf = valid.astype(jnp.float32)

    # --- Hypothesis sampling: [H, 4] indices drawn from valid entries.
    # Compact valid indices once, then draw uniform ints — avoids the
    # [H, N] gumbel materialization + per-row sort. Duplicate indices in
    # a draw yield a rank-deficient DLT whose hypothesis scores ~0 and
    # loses, the standard RANSAC treatment.
    nh = config.num_hypotheses
    if method == "rho" and quality is not None:
        # PROSAC: rank valid correspondences by quality (ascending), and
        # give hypothesis h a pool of the top n_h, n_h growing
        # geometrically 8 → num_valid across the batch.
        q = jnp.where(valid, jnp.asarray(quality, jnp.float32), jnp.inf)
        ranked = jnp.argsort(q).astype(jnp.int32)          # best-first
        nv = jnp.maximum(num_valid.astype(jnp.float32), 8.0)
        grow = jnp.exp2(jnp.linspace(0.0, 1.0, nh)
                        * jnp.log2(nv / 8.0)) * 8.0        # [H] in [8, nv]
        pool = jnp.minimum(jnp.ceil(grow), num_valid.astype(jnp.float32))
        pool = jnp.maximum(pool, jnp.minimum(
            num_valid.astype(jnp.float32), 8.0)).astype(jnp.int32)  # [H]
        # num_valid == 0 would give pool 0 → r = -1 (negative dynamic
        # gather); floor at 1 like the ransac branch's num_valid guard.
        pool = jnp.maximum(pool, 1)
        u = jax.random.uniform(key, (nh, 4))
        r = jnp.minimum((u * pool[:, None].astype(jnp.float32)).astype(
            jnp.int32), pool[:, None] - 1)
        sample_idx = ranked[r]                             # [H, 4]
    else:
        valid_first = jnp.argsort(~valid).astype(jnp.int32)   # valid prefix
        r = jax.random.randint(key, (nh, 4), 0,
                               jnp.maximum(num_valid, 1))
        sample_idx = valid_first[r]                            # [H, 4]

    s4 = src[sample_idx]                               # [H, 4, 2]
    d4 = dst[sample_idx]
    Hs = dlt_homography_solve(s4, d4)                  # [H, 3, 3]

    # --- Score all hypotheses against all points. ---
    err = symmetric_transfer_error(Hs, src[None], dst[None])  # [H, N]
    finite = jnp.all(jnp.isfinite(Hs.reshape(Hs.shape[0], -1)), axis=-1)
    # Degeneracy guards: a rank-deficient H collapses the plane to a
    # line/point with ZERO forward error on a many-to-one match cluster,
    # outscoring the true model (observed live against a synthetic 1M
    # DB). Collapse hypotheses come from degenerate minimal samples —
    # reject those exactly (_sample_nondegenerate) — and the |det|
    # check catches residual near-singular fits (det is scale-sensitive
    # in f32, so the sample check is the primary guard).
    finite &= _sample_nondegenerate(s4) & _sample_nondegenerate(d4)
    finite &= jnp.abs(_det3(Hs)) > 1e-6
    if method == "lmeds":
        # Median squared error over valid points; inlier gate from the
        # robust scale estimate (OpenCV LMeDS: 2.5·σ, σ = 1.4826·√med).
        big = jnp.float32(1e30)
        err_v = jnp.where(valid[None, :] & jnp.isfinite(err), err, jnp.nan)
        med = jnp.nanquantile(err_v, 0.5, axis=-1, method="nearest")
        med = jnp.where(jnp.isfinite(med), med, big)
        best = jnp.argmin(jnp.where(finite, med, big))
        hyp_ok = finite[best]
        thr2 = (2.5 * 1.4826) ** 2 * jnp.maximum(med[best], 1e-12)
        inliers = (err[best] < thr2) & valid & hyp_ok
        H_best = Hs[best]
    else:
        thr2 = config.reproj_threshold**2
        inl = (err < thr2) & valid[None, :]
        scores = jnp.where(finite, jnp.sum(inl, axis=-1), -1)
        best = jnp.argmax(scores)
        # Every hypothesis degenerate → fail closed: no inliers, no
        # refinement seed, ok=False below.
        hyp_ok = scores[best] >= 0
        H_best = Hs[best]
        inliers = inl[best] & hyp_ok

    # --- Refinement: masked DLT on the inlier set, re-derive inliers. ---
    def refine(_, carry):
        H_cur, inl_cur = carry
        w = inl_cur.astype(jnp.float32)
        H_new = dlt_homography_solve(src, dst, w)
        err_new = symmetric_transfer_error(H_new, src, dst)
        inl_new = (err_new < thr2) & valid
        better = jnp.sum(inl_new) >= jnp.sum(inl_cur)
        ok_new = jnp.all(jnp.isfinite(H_new)) & better & hyp_ok \
            & (jnp.abs(_det3(H_new)) > 1e-6)
        return (jnp.where(ok_new, H_new, H_cur), jnp.where(ok_new, inl_new, inl_cur))

    # Unrolled (refine_iters is small + static): lax.fori_loop pays a
    # per-iteration dispatch on TPU and blocks cross-iteration fusion.
    carry = (H_best, inliers)
    for _ in range(config.refine_iters):
        carry = refine(0, carry)
    H_best, inliers = carry
    num_inl = jnp.sum(inliers.astype(jnp.int32))
    ok = (num_valid >= 4) & (num_inl >= 4) & hyp_ok \
        & jnp.all(jnp.isfinite(H_best)) \
        & (jnp.abs(_det3(H_best)) > 1e-6)
    return HomographyResult(H=H_best, inliers=inliers, num_inliers=num_inl, ok=ok)
