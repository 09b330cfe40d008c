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

from ..core.cloud import PointCloud
from ..ops import knn
from .base import AlignResult, se3_delta_converged


class _IcpState(NamedTuple):
    T: jax.Array
    it: jax.Array
    converged: jax.Array
    error: jax.Array
    num_inliers: jax.Array


def _svd_rigid(src_pts, tgt_pts, w):
    """Weighted closed-form rigid transform src->tgt (Umeyama, no scale)."""
    wsum = jnp.clip(jnp.sum(w), 1e-12, None)
    mu_s = jnp.sum(src_pts * w[:, None], axis=0) / wsum
    mu_t = jnp.sum(tgt_pts * w[:, None], axis=0) / wsum
    S = ((src_pts - mu_s) * w[:, None]).T @ (tgt_pts - mu_t) / wsum
    U, _, Vt = jnp.linalg.svd(S)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], S.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
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
        T_new = _svd_rigid(moved, tgt.xyz[idx], w) @ s.T
        delta = T_new @ jnp.linalg.inv(s.T)
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
