"""k-NN PCA normal estimation (pcl::NormalEstimation semantics).

Used by the floor-detection normal prefilter (apps/floor_detection_nodelet.cpp:
211-238: k=10, viewpoint (0,0,sensor_height), verticality gate) and available
for GICP-style surface modeling. Batched: one covariance eigen-solve per
point via the closed-form 3x3 eigendecomposition (ops/eig3.py — no LAPACK).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.cloud import PointCloud
from . import knn


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(cloud: PointCloud, k: int, viewpoint) -> jax.Array:
    """Per-point unit normals oriented towards ``viewpoint``.

    PCL fits a plane to the k nearest neighbors *including* the point itself
    (kd-tree self-match), takes the smallest-eigenvalue eigenvector, then
    flips it so it points at the viewpoint. Returns (N, 3); padded rows give
    arbitrary unit vectors (mask with cloud.mask downstream).
    """
    xyz = cloud.valid_xyz()
    idx, _ = knn.knn(xyz, xyz, k)
    nbrs = xyz[idx]  # (N, k, 3)
    mean = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    # smallest eigenvector of each 3x3 covariance (closed form, ops/eig3.py)
    from .eig3 import smallest_eigenvector3

    _, normal = smallest_eigenvector3(cov)
    # orient towards viewpoint (PCL flipNormalTowardsViewpoint)
    to_vp = viewpoint[None, :] - cloud.xyz
    flip = jnp.sum(normal * to_vp, axis=-1) < 0
    normal = jnp.where(flip[:, None], -normal, normal)
    return normal
