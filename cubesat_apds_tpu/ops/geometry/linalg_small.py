"""Hand-rolled small-matrix linear algebra, batched and custom-call-free.

TPU lowers jnp.linalg.{solve, svd, eigh, lstsq} to LAPACK-style
custom-calls whose fixed overhead dwarfs the useful flops at 3×3…6×6
batch sizes (RANSAC hypothesis solving). These unrolled closed forms /
iterations compile to pure fused VPU arithmetic instead.
"""

from __future__ import annotations

import jax.numpy as jnp


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


def polar_rotation(S, iters: int = 12):
    """Nearest rotation to [..., 3, 3] S (det(S) > 0 branch) via Newton
    polar iteration X ← (X + X⁻ᵀ)/2 with determinant-scaling.

    For det(S) < 0 (reflection) the polar factor is NOT the Procrustes
    optimum; callers on the RANSAC hot path treat that case as a
    degenerate hypothesis (returns the polar orthogonal factor, det −1,
    which scores poorly downstream).
    """
    X = S
    # Scale for convergence: divide by an estimate of the spectral norm.
    norm = jnp.sqrt(jnp.sum(S * S, axis=(-2, -1), keepdims=True) / 3.0)
    X = S / jnp.where(norm < 1e-20, 1e-20, norm)
    for _ in range(iters):
        Xinv_t = jnp.swapaxes(inv3x3(X), -1, -2)
        X = 0.5 * (X + Xinv_t)
    return X
