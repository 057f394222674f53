"""Hand-rolled small-matrix linear algebra, batched and custom-call-free.

TPU lowers jnp.linalg.{solve, svd, eigh, lstsq} to LAPACK-style
custom-calls whose fixed overhead dwarfs the useful flops at 3×3…6×6
batch sizes (RANSAC hypothesis solving). These unrolled closed forms /
iterations compile to pure fused VPU arithmetic instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def highest_matmul_precision(fn):
    """Trace the wrapped function under full-f32 matmul precision.

    TPU lowers f32 dot/einsum to bf16 MXU passes by DEFAULT — fine for
    descriptor matching and image filtering, catastrophic for geometry:
    the round-4 ground-truth harness measured 15-46 KM position errors
    on TPU (vs 3-7 m on CPU, identical program) because every solver
    contraction — DLT normal equations, EPnP nullspace, GN steps —
    carried ~0.4% relative error. Wrap solver entry points with this
    (inside their jit: the context is a trace-time setting).
    """
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapper


def inv3x3(A):
    """Adjugate inverse of [..., 3, 3]."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2)
    return adj / det[..., None, None]


def det3x3(A):
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def cholesky_solve(A, b, damp: float = 0.0):
    """Solve A x = b for symmetric positive-definite [..., N, N] with
    N ≤ ~8, via unrolled Cholesky. b: [..., N] or [..., N, M]."""
    n = A.shape[-1]
    if damp:
        A = A + damp * jnp.eye(n, dtype=A.dtype)
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    # Unrolled Cholesky: L lower-triangular with A = L Lᵀ.
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]
    # Forward substitution L y = b.
    y = [None] * n
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - L[i][k][..., None] * y[k]
        y[i] = s / L[i][i][..., None]
    # Back substitution Lᵀ x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][..., None] * x[k]
        x[i] = s / L[i][i][..., None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def lstsq_normal(A, b, damp: float = 1e-9):
    """Least squares via normal equations + unrolled Cholesky.

    A: [..., M, N] (N small), b: [..., M]. Good to ~√cond of direct LS —
    fine for the well-scaled RANSAC subproblems."""
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    Atb = jnp.einsum("...mi,...m->...i", A, b)
    return cholesky_solve(AtA, Atb, damp=damp)


def eigh3x3(A, iters: int = 4):
    """Symmetric 3×3 eigendecomposition via unrolled cyclic Jacobi sweeps.

    Replaces the jnp.linalg.eigh custom-call on [..., 3, 3] (e.g. the EPnP
    control-point covariance, vmapped over RANSAC hypotheses). Returns
    (eigvals ascending [..., 3], eigvecs as COLUMNS [..., 3, 3]) matching
    jnp.linalg.eigh's convention. Jacobi is unconditionally stable and
    handles repeated eigenvalues (the rotation angle is just 0 there).
    """
    A = jnp.asarray(A)
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)

    def rotate(A, V, p, q):
        app, aqq, apq = A[..., p, p], A[..., q, q], A[..., p, q]
        # tan(2θ) = 2 a_pq / (a_pp − a_qq); stable half-angle form.
        # sign must be ±1 (NOT jnp.sign: at tau == 0 — equal diagonal
        # entries with nonzero a_pq — the rotation is exactly 45° and
        # t must be 1, but sign(0)=0 froze the element unannihilated).
        tau = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30, 1e-30, apq))
        s_tau = jnp.where(tau >= 0, 1.0, -1.0)
        t = s_tau / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # Build the Givens rotation as a full 3×3 (cheap at this size,
        # keeps everything batched / gather-free).
        eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
        hot_pp = jnp.zeros((3, 3), A.dtype).at[p, p].set(1.0)
        hot_qq = jnp.zeros((3, 3), A.dtype).at[q, q].set(1.0)
        hot_pq = jnp.zeros((3, 3), A.dtype).at[p, q].set(1.0)
        hot_qp = jnp.zeros((3, 3), A.dtype).at[q, p].set(1.0)
        cm1 = (c - 1.0)[..., None, None]
        sm = s[..., None, None]
        G = eye + cm1 * (hot_pp + hot_qq) + sm * hot_pq - sm * hot_qp
        A = jnp.swapaxes(G, -1, -2) @ A @ G
        V = V @ G
        return A, V

    # Sweeps roll through lax.fori_loop (static rotation targets inside
    # the body): unrolling them produced graphs deep enough to crash
    # XLA's executable serializer (stack overflow) and slow compiles.
    def sweep(_, carry):
        A, V = carry
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = rotate(A, V, p, q)
        return (A, V)

    A, V = jax.lax.fori_loop(0, iters, sweep, (A, V))
    w = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def _mgs_orthonormalize(Q):
    """Modified Gram-Schmidt on the COLUMNS of [..., n, k] (k small,
    unrolled). Degenerate columns collapse toward zero and are rescued
    with a tiny deterministic perturbation before normalization."""
    n, k = Q.shape[-2], Q.shape[-1]
    cols = [Q[..., :, j] for j in range(k)]
    for j in range(k):
        v = cols[j]
        for i in range(j):
            v = v - jnp.sum(cols[i] * v, axis=-1, keepdims=True) * cols[i]
        norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        # Rescue a collapsed direction with a fixed unit vector; MGS of
        # the NEXT sweep (callers iterate) re-orthogonalizes it.
        fallback = jnp.zeros((n,), Q.dtype).at[j % n].set(1.0)
        v = jnp.where(norm < 1e-20, fallback, v / jnp.maximum(norm, 1e-20))
        cols[j] = v
    return jnp.stack(cols, axis=-1)


def eigh_smallest(A, k: int = 4, iters: int = 3):
    """k smallest-eigenvalue eigenvectors of symmetric PSD [..., n, n],
    custom-call-free (damped inverse iteration + small Jacobi
    Rayleigh-Ritz).

    Replaces jnp.linalg.eigh for the EPnP 12×12 MᵀM nullspace basis
    (PERF.md roadmap: the eigh custom-call costs ~0.5 ms/frame at RANSAC
    hypothesis batch sizes). Iterates Q ← (A + εI)⁻¹ Q via the unrolled
    Cholesky: contamination of the bottom subspace shrinks by
    (λ_small + ε)/(λ_next + ε) ≈ ε/λ_next per step, so a handful of
    iterations reach f32 accuracy even from a generic start basis.
    Returns [..., n, k] with columns ordered by ascending eigenvalue.
    """
    A = jnp.asarray(A)
    n = A.shape[-1]
    diag_mean = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1),
                         axis=-1)[..., None, None]
    eps = 1e-5 * jnp.maximum(diag_mean, 1e-30)
    Ad = A + eps * jnp.eye(n, dtype=A.dtype)

    # Deterministic full-rank init (mixes all coordinates so no target
    # eigvec is orthogonal to the start basis except on a null set).
    import numpy as _np
    rng = _np.random.default_rng(12345)
    Q0 = _np.linalg.qr(rng.standard_normal((n, k)))[0].astype(_np.float32)
    Q = jnp.broadcast_to(jnp.asarray(Q0, A.dtype), A.shape[:-2] + (n, k))

    Q = jax.lax.fori_loop(
        0, iters,
        lambda _, q: _mgs_orthonormalize(cholesky_solve(Ad, q)), Q)

    # Rayleigh-Ritz on A restricted to span(Q): k×k Jacobi.
    S = jnp.swapaxes(Q, -1, -2) @ (A @ Q)
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    w, U = _jacobi_small(S)
    return Q @ U


def _jacobi_small(S, iters: int = 6):
    """Cyclic Jacobi for symmetric [..., k, k] with k ≤ ~6 (unrolled).
    Returns (eigvals ascending, eigvecs as columns)."""
    k = S.shape[-1]
    V = jnp.broadcast_to(jnp.eye(k, dtype=S.dtype), S.shape)

    def sweep(_, carry):
        S, V = carry
        for p in range(k):
            for q in range(p + 1, k):
                app, aqq, apq = S[..., p, p], S[..., q, q], S[..., p, q]
                tau = (aqq - app) / (
                    2.0 * jnp.where(jnp.abs(apq) < 1e-30, 1e-30, apq))
                s_tau = jnp.where(tau >= 0, 1.0, -1.0)  # ±1, see eigh3x3
                t = s_tau / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                eye = jnp.broadcast_to(jnp.eye(k, dtype=S.dtype), S.shape)
                hot_pp = jnp.zeros((k, k), S.dtype).at[p, p].set(1.0)
                hot_qq = jnp.zeros((k, k), S.dtype).at[q, q].set(1.0)
                hot_pq = jnp.zeros((k, k), S.dtype).at[p, q].set(1.0)
                hot_qp = jnp.zeros((k, k), S.dtype).at[q, p].set(1.0)
                cm1 = (c - 1.0)[..., None, None]
                sm = s[..., None, None]
                G = eye + cm1 * (hot_pp + hot_qq) + sm * hot_pq - sm * hot_qp
                S = jnp.swapaxes(G, -1, -2) @ S @ G
                V = V @ G
        return (S, V)

    S, V = jax.lax.fori_loop(0, iters, sweep, (S, V))
    w = jnp.diagonal(S, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, axis=-1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w_sorted, V_sorted


def polar_rotation(S, iters: int = 8):
    """Nearest rotation to [..., 3, 3] S (det(S) > 0 branch) via Newton
    polar iteration X ← (X + X⁻ᵀ)/2 with determinant-scaling.

    For det(S) < 0 (reflection) the polar factor is NOT the Procrustes
    optimum; callers on the RANSAC hot path treat that case as a
    degenerate hypothesis (returns the polar orthogonal factor, det −1,
    which scores poorly downstream).
    """
    # Scale for convergence: divide by an estimate of the spectral norm.
    norm = jnp.sqrt(jnp.sum(S * S, axis=(-2, -1), keepdims=True) / 3.0)
    X = S / jnp.where(norm < 1e-20, 1e-20, norm)
    return jax.lax.fori_loop(
        0, iters,
        lambda _, x: 0.5 * (x + jnp.swapaxes(inv3x3(x), -1, -2)), X)
