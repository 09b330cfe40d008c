"""Closed-form symmetric 3x3 eigen-decomposition, branch-free and batched.

jnp.linalg.eigh on (N, 3, 3) batches lowers to a generic iterative
factorization that wastes the VPU; for the covariance shaping GICP/NDT need
(plane regularization, eigenvalue floors) the trigonometric closed form
(Smith 1961) is exact, branch-free, and fuses into the surrounding
elementwise code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-20


def eigvalsh3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3), ascending. Trigonometric form."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.clip(p2, _EPS, None) / 6.0)

    # det((A - qI)/p) / 2
    b00, b11, b22 = d0 / p, d1 / p, d2 / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min
    # near-isotropic matrices (p2 ~ 0): all eigenvalues = q
    iso = p2 < 1e-18
    lam_min = jnp.where(iso, q, lam_min)
    lam_mid = jnp.where(iso, q, lam_mid)
    lam_max = jnp.where(iso, q, lam_max)
    return jnp.stack([lam_min, lam_mid, lam_max], axis=-1)


def _eigvec_for(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvector of symmetric (...,3,3) for eigenvalue lam (...,): the
    null direction of (A - lam I), found as the largest cross product of its
    rows (branch-free row-pair selection)."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best12 = (n12 >= n01) & (n12 >= n02)
    best02 = (n02 >= n01) & jnp.logical_not(best12)
    v = jnp.where(
        best12[..., None], c12, jnp.where(best02[..., None], c02, c01)
    )
    norm = jnp.sqrt(jnp.clip(jnp.sum(v * v, axis=-1, keepdims=True), _EPS, None))
    v = v / norm
    # degenerate (repeated eigenvalue): any unit vector in the eigenspace
    # works for the regularization use cases; fall back to +z
    degen = (jnp.maximum(jnp.maximum(n01, n02), n12) < 1e-24)
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(degen[..., None], fallback, v)


def smallest_eigenvector3(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(eigenvalue, unit eigenvector) of the smallest eigenpair."""
    lams = eigvalsh3(A)
    lam = lams[..., 0]
    return lam, _eigvec_for(A, lam)


def plane_regularize(covs: jax.Array, eps: float = 1e-3) -> jax.Array:
    """fast_gicp RegularizationMethod::PLANE without a full eigh:
    eigenvalues -> (eps, 1, 1) == I - (1 - eps) v_min v_min^T."""
    _, v = smallest_eigenvector3(covs)
    eye = jnp.eye(3, dtype=covs.dtype)
    return eye - (1.0 - eps) * v[..., :, None] * v[..., None, :]


def floor_regularize(covs: jax.Array, rel_floor: float = 0.01, rel_guard: float = 1e-3) -> jax.Array:
    """PCL NDT cell conditioning: floor eigenvalues at rel_floor * lam_max,
    exactly and branch-free: C + sum_i max(0, floor - lam_i) v_i v_i^T.
    Only the two smaller eigenpairs can be below the floor.

    rel_guard (round-5): for a near-rank-1 cell (a ground ring-arc is a
    LINE of points: lam_min ~ lam_mid ~ 1e-5 * lam_max with a nearly
    degenerate null 2-space) the closed-form f32 eigenvectors are noise-
    dominated, and the rank-2 correction along slightly-wrong directions
    can leave a residual NEGATIVE eigenvalue (~ -3e-5 * lam_max observed on
    TPU, whose f32 transcendentals differ a few ulp from CPU's). Inverting
    that near-singular result amplified it to an indefinite icov with eig
    ~ -1e5, exp(-d2/2 * q^T icov q) overflowed, and the NDT Newton loop
    false-converged on a -inf score at iteration 1 (silently tracking
    nothing — caught by the round-5 per-method rotation/drift guards). The
    guard adds rel_guard * lam_max * I: 10x below the PCL floor (spectrum
    change is semantically invisible) and ~30x above the observed f32
    eigenvector error, so the result is PD by construction on any
    platform."""
    lams = eigvalsh3(covs)
    lam_min, lam_mid, lam_max = lams[..., 0], lams[..., 1], lams[..., 2]
    floor = rel_floor * lam_max
    v_min = _eigvec_for(covs, lam_min)
    v_mid = _eigvec_for(covs, lam_mid)
    # orthogonalize v_mid against v_min (repeated-eigenvalue robustness)
    v_mid = v_mid - jnp.sum(v_mid * v_min, axis=-1, keepdims=True) * v_min
    v_mid = v_mid / jnp.sqrt(jnp.clip(jnp.sum(v_mid * v_mid, axis=-1, keepdims=True), _EPS, None))
    add_min = jnp.clip(floor - lam_min, 0.0, None)
    add_mid = jnp.clip(floor - lam_mid, 0.0, None)
    eye = jnp.eye(3, dtype=covs.dtype)
    return (
        covs
        + add_min[..., None, None] * v_min[..., :, None] * v_min[..., None, :]
        + add_mid[..., None, None] * v_mid[..., :, None] * v_mid[..., None, :]
        + (rel_guard * lam_max)[..., None, None] * eye
    )
