"""Batched-hypothesis plane RANSAC.

TPU-native replacement for pcl::RandomSampleConsensus +
SampleConsensusModelPlane as driven by the floor detector
(apps/floor_detection_nodelet.cpp:137-144, distance threshold 0.1).

Where PCL samples hypotheses sequentially with early termination, the TPU
design draws a fixed batch of K triplets, evaluates every hypothesis against
every point in one (K, N) masked matrix, and argmaxes the inlier count —
deterministic given the PRNG key, no data-dependent control flow, and
strictly more hypotheses than PCL's adaptive loop typically visits.
PCL returns the winning hypothesis coefficients un-refined (the reference
does not call refineModel), so we do the same.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.cloud import PointCloud


class PlaneRansacResult(NamedTuple):
    coeffs: jax.Array  # (4,) best plane (unit normal, d); n.p + d = 0
    inlier_mask: jax.Array  # (N,) bool
    num_inliers: jax.Array  # () int32


@partial(jax.jit, static_argnames=("num_hypotheses",))
def fit_plane(
    cloud: PointCloud,
    key: jax.Array,
    distance_thresh=0.1,
    num_hypotheses: int = 1024,
) -> PlaneRansacResult:
    """Fit a plane by batched RANSAC over the cloud's valid points."""
    xyz = cloud.xyz
    mask = cloud.mask
    n = xyz.shape[0]
    count = jnp.clip(jnp.sum(mask.astype(jnp.int32)), 1, None)

    # Sample triplet indices from the valid prefix. Clouds are compacted
    # before RANSAC (see frontend/floor.py), so valid points occupy [0, count).
    tri = jax.random.randint(key, (num_hypotheses, 3), 0, n) % count

    p0, p1, p2 = xyz[tri[:, 0]], xyz[tri[:, 1]], xyz[tri[:, 2]]
    normal = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    degenerate = norm[:, 0] < 1e-8
    normal = normal / jnp.clip(norm, 1e-12, None)
    d = -jnp.sum(normal * p0, axis=-1)

    # score every hypothesis against every point
    sd = jnp.abs(xyz @ normal.T + d[None, :])  # (N, K)
    inlier = (sd < distance_thresh) & mask[:, None]
    counts = jnp.sum(inlier, axis=0)
    counts = jnp.where(degenerate, -1, counts)

    best = jnp.argmax(counts)
    coeffs = jnp.concatenate([normal[best], d[best][None]])
    return PlaneRansacResult(
        coeffs=coeffs,
        inlier_mask=inlier[:, best],
        num_inliers=counts[best].astype(jnp.int32),
    )
