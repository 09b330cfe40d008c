"""Point-to-point ICP (pcl::IterativeClosestPoint semantics), TPU-native.

Reference usage: src/hdl_graph_slam/registrations.cpp:57-64 (ICP method with
transformation_epsilon, max_iterations, max_correspondence_distance,
optional reciprocal correspondences).

Per iteration: 1-NN correspondences of the transformed source in the target
gated by max_correspondence_distance (optionally reciprocal), closed-form
rigid alignment of the matched pairs (Umeyama/SVD — PCL's
TransformationEstimationSVD), convergence when the incremental transform is
small. The SVD of the 3x3 cross-covariance is batched-friendly and exact.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.cloud import PointCloud
from ..ops import knn
from .base import AlignResult, se3_delta_converged


class _IcpState(NamedTuple):
    T: jax.Array
    it: jax.Array
    converged: jax.Array
    error: jax.Array
    num_inliers: jax.Array


def procrustes_rotation(S):
    """Umeyama-optimal rotation from the 3x3 cross-covariance S (maps
    src-deviations to tgt-deviations): the R = V D U^T of PCL's SVD
    solution, built from the closed-form symmetric eigensolver (ops/eig3)
    instead of LAPACK SVD.

    Why not jnp.linalg.svd: a 3x3 SVD inside the ICP while_loop reliably
    SIGABRTs the TPU compiler (remote tpu_compile_helper) — and the closed
    form fuses into the surrounding elementwise code anyway.

    Construction: right singular vectors V from eig(S^T S) (descending
    sigma), completed right-handed; left vectors u_i = S v_i normalized,
    Gram-Schmidt + cross-product completion, so U is right-handed too. The
    cross-product third column absorbs the Umeyama D = diag(1,1,det(UV))
    reflection flip (it negates u3 exactly when det(S) < 0), and rank-2
    cross-covariances (planar scans) stay well-defined."""
    from ..ops.eig3 import _eigvec_for, eigvalsh3

    dtype = S.dtype
    StS = S.T @ S
    lam = eigvalsh3(StS)  # ascending
    v1 = _eigvec_for(StS, lam[2])
    v3 = _eigvec_for(StS, lam[0])
    # Robust completion (round-5): when BOTH eigenpairs hit _eigvec_for's
    # degenerate fallback (+z) — S ~ 0 after every correspondence is lost,
    # or a spectrum collapse — v3 == v1 and cross(v3, v1) == 0, which used
    # to produce a SINGULAR "rotation" that silently poisoned the pose
    # chain (caught by the r5 det/orthogonality bench guards: det err
    # 0.065 on the ICP window). If v3 is (near-)collinear with v1, replace
    # it with the standard basis vector least aligned with v1 before
    # building the right-handed frame.
    c31 = jnp.cross(v3, v1)
    collinear = jnp.sum(c31 * c31) < 1e-12
    basis = jnp.eye(3, dtype=dtype)
    alt = basis[jnp.argmin(jnp.abs(v1))]
    v3 = jnp.where(collinear, alt, v3)
    v2 = jnp.cross(v3, v1)
    v2 = v2 / jnp.clip(jnp.linalg.norm(v2), 1e-20, None)
    v3 = jnp.cross(v1, v2)  # right-handed orthonormal [v1 v2 v3]
    u1 = S @ v1
    u1 = u1 / jnp.clip(jnp.linalg.norm(u1), 1e-20, None)
    u2 = S @ v2
    u2 = u2 - jnp.dot(u1, u2) * u1
    # rank-1 S: S v2 ~ 0 and Gram-Schmidt leaves nothing — complete U with
    # the basis vector least aligned with u1 (any orthonormal completion is
    # Umeyama-optimal for the unconstrained DOF), same robustness as v3
    u2_n2 = jnp.sum(u2 * u2)
    alt_u = basis[jnp.argmin(jnp.abs(u1))]
    alt_u = alt_u - jnp.dot(u1, alt_u) * u1
    u2 = jnp.where(u2_n2 < 1e-12, alt_u, u2)
    u2 = u2 / jnp.clip(jnp.linalg.norm(u2), 1e-20, None)
    u3 = jnp.cross(u1, u2)
    V = jnp.stack([v1, v2, v3], axis=1).astype(dtype)
    U = jnp.stack([u1, u2, u3], axis=1).astype(dtype)
    R = jnp.matmul(V, U.T, precision=jax.lax.Precision.HIGHEST)
    # u1 is undefined when S v1 ~ 0 (S ~ 0: zero inliers, or v1 in S's
    # null space) — no rotation information at all; return identity rather
    # than whatever frame the clipped normalizations produced
    degenerate = jnp.sum((S @ v1) ** 2) < 1e-24
    R = jnp.where(degenerate, jnp.eye(3, dtype=dtype), R)
    # polar tightening (two Newton-Schulz steps): R <- R(1.5 I - 0.5 R^T R)
    # pulls f32 rounding drift back onto SO(3) before the pose chain
    # compounds it (quadratic: 1e-3 error -> 1e-6 -> ~f32 ulp; one step
    # left the 256-frame windowed chain at det drift 7.7e-5, grazing the
    # 1e-4 bench guard)
    eye3 = jnp.eye(3, dtype=dtype)
    for _ in range(2):
        RtR = jnp.matmul(R.T, R, precision=jax.lax.Precision.HIGHEST)
        R = jnp.matmul(R, 1.5 * eye3 - 0.5 * RtR,
                       precision=jax.lax.Precision.HIGHEST)
    return R


def _svd_rigid(src_pts, tgt_pts, w):
    """Weighted closed-form rigid transform src->tgt (Umeyama, no scale)."""
    wsum = jnp.clip(jnp.sum(w), 1e-12, None)
    mu_s = jnp.sum(src_pts * w[:, None], axis=0) / wsum
    mu_t = jnp.sum(tgt_pts * w[:, None], axis=0) / wsum
    S = ((src_pts - mu_s) * w[:, None]).T @ (tgt_pts - mu_t) / wsum
    R = procrustes_rotation(S)
    t = mu_t - R @ mu_s
    T = jnp.eye(4, dtype=S.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@partial(jax.jit, static_argnames=("max_iterations", "use_reciprocal"))
def align(
    tgt: PointCloud,
    src: PointCloud,
    guess: jax.Array,
    max_corr_dist=2.5,
    transformation_epsilon=0.01,
    max_iterations: int = 64,
    use_reciprocal: bool = False,
) -> AlignResult:
    dtype = guess.dtype
    tgt_q = tgt.valid_xyz()

    def cond(s: _IcpState):
        return (s.it < max_iterations) & jnp.logical_not(s.converged)

    def body(s: _IcpState):
        R = s.T[:3, :3]
        t = s.T[:3, 3]
        moved = src.xyz @ R.T + t
        moved_q = jnp.where(src.mask[:, None], moved, 1.0e6)
        idx, d2 = knn.nn1(moved_q, tgt_q)
        valid = src.mask & tgt.mask[idx] & (d2 < max_corr_dist * max_corr_dist)
        if use_reciprocal:
            back_idx, _ = knn.nn1(tgt_q, moved_q)
            valid = valid & (back_idx[idx] == jnp.arange(src.xyz.shape[0]))
        w = valid.astype(dtype)
        delta = _svd_rigid(moved, tgt.xyz[idx], w)  # the incremental transform
        T_new = se3.compose(delta, s.T)
        err = jnp.sum(jnp.where(valid, d2, 0.0)) / jnp.clip(jnp.sum(w), 1.0, None)
        conv = se3_delta_converged(delta, transformation_epsilon)
        ninl = jnp.sum(valid.astype(jnp.int32)).astype(jnp.int32)
        return _IcpState(T=T_new, it=s.it + 1, converged=conv, error=err,
                         num_inliers=ninl)

    init = _IcpState(
        T=guess,
        it=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        error=jnp.asarray(jnp.inf, dtype),
        num_inliers=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return AlignResult(
        transformation=final.T,
        converged=final.converged,
        iterations=final.it,
        error=final.error,
        num_inliers=final.num_inliers,
    )
