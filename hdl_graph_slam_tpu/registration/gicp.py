"""GICP (plane-to-plane ICP) with fast_gicp::FastGICP semantics, TPU-native.

Reference usage: src/hdl_graph_slam/registrations.cpp:27-35 (FAST_GICP is the
launch default), parameters reg_transformation_epsilon=0.01,
reg_maximum_iterations=64, reg_max_correspondence_distance=2.5,
reg_correspondence_randomness=20 (launch/hdl_graph_slam.launch:73-82).

Algorithm (Segal et al. 2009, as implemented by fast_gicp):
- per-point covariances from the k=20 nearest neighbors, eigenvalues
  regularized to (1, 1, 1e-3) ("plane" regularization);
- per iteration: 1-NN correspondences of the transformed source in the
  target, gated by max_correspondence_distance; Mahalanobis weight
  M_i = (C_b + T C_a T^T)^-1; residual e_i = b - T a;
- Levenberg-Marquardt on SE(3) with Nielsen damping (fast_gicp
  LsqRegistration::step_lm), convergence when the incremental update is
  elementwise below transformation_epsilon.

TPU mapping: correspondences ride the MXU brute-force NN (ops/knn.py);
Mahalanobis solves are batched closed-form 3x3 inverses; H/b assembly is one
einsum; the optimizer is a lax.while_loop with all state on device. The
whole align() is one compiled program — and is vmappable over candidate
batches for loop closure.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.cloud import PointCloud
from ..ops import knn
from ..ops.eig3 import plane_regularize
from .base import AlignResult, lm_loop


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GicpCloud:
    """A cloud preprocessed for GICP: points + regularized covariances."""

    xyz: jax.Array  # (N, 3)
    mask: jax.Array  # (N,)
    covs: jax.Array  # (N, 3, 3)


def _regularize_covs_plane(covs: jax.Array) -> jax.Array:
    """fast_gicp RegularizationMethod::PLANE: eigenvalues -> (1e-3, 1, 1),
    via the closed-form smallest eigenvector (ops/eig3.py) instead of a
    batched iterative eigh."""
    return plane_regularize(covs + 1e-9 * jnp.eye(3, dtype=covs.dtype))


@partial(jax.jit, static_argnames=("k", "exact"))
def preprocess(cloud: PointCloud, k: int = 20, exact: bool = False) -> GicpCloud:
    """Compute per-point regularized covariances from k nearest neighbors
    (fast_gicp calculate_covariances; k = correspondence_randomness).

    By default the neighbor set comes from the TPU-accelerated ~0.95-recall
    partial reduction (knn.knn_approx) — statistically indistinguishable
    after plane regularization; pass exact=True for bit-exact parity runs.
    """
    xyz = cloud.valid_xyz()
    if exact:
        idx, _ = knn.knn(xyz, xyz, k)
    else:
        # neighbor SET only — the covariance is permutation-invariant, so the
        # exact-distance rescore (the expensive part of knn_approx) is
        # skipped; 0.85 recall is statistically invisible after plane
        # regularization (alignment parity tested vs exact neighbors:
        # TestApproxExactParity) and ~15% cheaper selection than 0.9
        idx, _ = knn.knn_approx(xyz, xyz, k, recall_target=0.85, exact_dists=False)
    nbrs = xyz[idx]  # (N, k, 3)
    mean = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mean
    covs = jnp.einsum("nki,nkj->nij", centered, centered) / k
    covs = _regularize_covs_plane(covs)
    covs = jnp.where(cloud.mask[:, None, None], covs, jnp.eye(3, dtype=covs.dtype))
    return GicpCloud(xyz=cloud.xyz, mask=cloud.mask, covs=covs)


def _inv3x3(m: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate/determinant)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


class GicpCorr(NamedTuple):
    """Fixed correspondence state for one linearization (fast_gicp
    update_correspondences): target indices, validity gate, Mahalanobis."""

    idx: jax.Array  # (N,) target index per source point
    Mw: jax.Array  # (N, 3, 3) gated mahalanobis (zeroed for invalid)
    num: jax.Array  # () int32 valid count


def _associate(T, src: GicpCloud, tgt: GicpCloud, max_corr_dist) -> GicpCorr:
    """NN correspondences + Mahalanobis at pose T (fixed through LM trials)."""
    R = T[:3, :3]
    t = T[:3, 3]
    moved = src.xyz @ R.T + t
    moved_q = jnp.where(src.mask[:, None], moved, 1.0e6)
    idx, d2 = knn.nn1(moved_q, jnp.where(tgt.mask[:, None], tgt.xyz, 1.0e6))
    valid = src.mask & tgt.mask[idx] & (d2 < max_corr_dist * max_corr_dist)
    cov_b = tgt.covs[idx]
    RCA = jnp.einsum("ij,njk,lk->nil", R, src.covs, R)
    M = _inv3x3(cov_b + RCA)
    Mw = M * valid.astype(T.dtype)[:, None, None]
    return GicpCorr(idx=idx, Mw=Mw, num=jnp.sum(valid.astype(jnp.int32)))


def _linearize_at(T, corr: GicpCorr, src: GicpCloud, tgt: GicpCloud):
    R = T[:3, :3]
    t = T[:3, 3]
    moved = src.xyz @ R.T + t
    e = tgt.xyz[corr.idx] - moved  # (N, 3)
    # J_i = d e / d [v, w] for left-multiplied increment exp([v,w]) T:
    # e(delta) ~= e - v - w x (T a)  =>  J = [-I | skew(moved)]
    skew = se3.hat(moved)  # (N, 3, 3)
    J = jnp.concatenate([-jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), skew.shape), skew], axis=-1)
    MJ = jnp.einsum("nij,njk->nik", corr.Mw, J)
    H = jnp.einsum("nji,njk->ik", J, MJ)
    b = jnp.einsum("nji,njk,nk->i", J, corr.Mw, e)
    cost = jnp.einsum("ni,nij,nj->", e, corr.Mw, e)
    return H, b, cost, corr.num


def _cost_at(T, corr: GicpCorr, src: GicpCloud, tgt: GicpCloud):
    R = T[:3, :3]
    t = T[:3, 3]
    moved = src.xyz @ R.T + t
    e = tgt.xyz[corr.idx] - moved
    return jnp.einsum("ni,nij,nj->", e, corr.Mw, e)


@partial(jax.jit, static_argnames=("max_iterations", "reassoc_displacement"))
def align(
    tgt: GicpCloud,
    src: GicpCloud,
    guess: jax.Array,
    max_corr_dist=2.5,
    transformation_epsilon=0.01,
    max_iterations: int = 64,
    lm_init_lambda_factor=1e-9,
    reassoc_displacement: float = 0.0,
) -> AlignResult:
    """Align source onto target starting from ``guess`` (4x4).

    Follows fast_gicp's LM loop (see base.lm_loop).
    reassoc_displacement > 0 carries correspondences across LM iterations
    until the accumulated displacement bound exceeds that many meters (the
    terminal pose still satisfies fast_gicp's fixed-point condition — see
    base.lm_loop); 0.0 re-associates every iteration like fast_gicp.
    """
    r_max = None
    if reassoc_displacement:
        r_max = jnp.sqrt(jnp.max(jnp.where(src.mask, jnp.sum(src.xyz * src.xyz, axis=-1), 0.0)))
    return lm_loop(
        associate=lambda T: _associate(T, src, tgt, max_corr_dist),
        linearize_at=lambda T, corr: _linearize_at(T, corr, src, tgt),
        cost_at=lambda T, corr: _cost_at(T, corr, src, tgt),
        guess=guess,
        max_iterations=max_iterations,
        transformation_epsilon=transformation_epsilon,
        lm_init_lambda_factor=lm_init_lambda_factor,
        reassoc_displacement=reassoc_displacement,
        r_max=r_max,
    )
