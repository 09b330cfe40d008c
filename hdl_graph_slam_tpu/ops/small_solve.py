"""Unrolled tiny-matrix solves for the per-iteration 6x6 Newton/LM systems.

jnp.linalg.solve / cholesky / eigvalsh on a single 6x6 lower to generic
LAPACK-style algorithms (LU with pivoting, QDWH eig) that are long serial
scalar chains on TPU — measurable milliseconds when they sit inside a
registration while_loop. The damped Gauss-Newton/Newton systems here are
symmetric positive definite by construction, so a fully unrolled Cholesky
(21 multiply-adds + 6 rsqrts for n=6) plus unrolled triangular solves is
exact and orders of magnitude cheaper.

Also provides a Gershgorin lower bound on the smallest eigenvalue — the
cheap substitute for the exact min-eigenvalue PD test PCL's NDT uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_unrolled(A: jax.Array, n: int = 6):
    """Lower-triangular Cholesky factor of the SPD (n, n) matrix as a list of
    rows of traced scalars (Python-unrolled; n is static and small), plus the
    minimum pivot argument encountered — non-positive iff A was not PD (the
    factorization is clamped, so callers can branchlessly select a fallback)."""
    L = [[None] * n for _ in range(n)]
    min_pivot = None
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                min_pivot = s if min_pivot is None else jnp.minimum(min_pivot, s)
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L, min_pivot


def solve_spd_checked(A: jax.Array, b: jax.Array, n: int = 6):
    """(x, min_pivot) = (A^-1 b, smallest Cholesky pivot argument).

    min_pivot <= 0 means A was not PD and x came from the clamped factor
    (callers select a more-damped fallback in that case)."""
    L, min_pivot = cholesky_unrolled(A, n)
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x), min_pivot


def solve_spd(A: jax.Array, b: jax.Array, n: int = 6) -> jax.Array:
    """x = A^-1 b for SPD (n, n) A via unrolled Cholesky + substitutions."""
    return solve_spd_checked(A, b, n)[0]


def gershgorin_min(A: jax.Array) -> jax.Array:
    """Lower bound on the smallest eigenvalue of symmetric A:
    min_i (A_ii - sum_{j != i} |A_ij|)."""
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    offsum = jnp.sum(jnp.abs(A), axis=-1) - jnp.abs(diag)
    return jnp.min(diag - offsum, axis=-1)
