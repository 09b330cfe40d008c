"""Point-cloud conditioning filters (mask-based, static shapes).

TPU-native equivalents of the PCL filters the reference's prefiltering and
floor-detection stages drive:
- distance band-pass (apps/prefiltering_nodelet.cpp:164-180)
- statistical outlier removal (prefiltering_nodelet.cpp:76-82 ->
  pcl::StatisticalOutlierRemoval: mean k-NN distance vs global mean+std gate)
- radius outlier removal (prefiltering_nodelet.cpp:84-90 ->
  pcl::RadiusOutlierRemoval: neighbor count in radius)
- half-space plane clip (apps/floor_detection_nodelet.cpp:189-204 ->
  pcl::PlaneClipper3D + ExtractIndices)
- IMU angular-velocity deskewing (prefiltering_nodelet.cpp:182-243)

All filters *mask* points rather than compacting, so shapes stay static;
call cloud.compact() (core/cloud.py) when a dense repack is wanted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.cloud import PAD_COORD, PointCloud
from . import knn


def _remask(cloud: PointCloud, keep: jax.Array) -> PointCloud:
    mask = cloud.mask & keep
    xyz = jnp.where(mask[:, None], cloud.xyz, PAD_COORD)
    inten = None if cloud.intensity is None else jnp.where(mask, cloud.intensity, 0.0)
    return PointCloud(xyz=xyz, mask=mask, intensity=inten)


@jax.jit
def distance_filter(cloud: PointCloud, near_thresh, far_thresh) -> PointCloud:
    """Keep points with near < ||p|| < far (strict, like the reference)."""
    d = jnp.linalg.norm(cloud.xyz, axis=-1)
    keep = (d > near_thresh) & (d < far_thresh)
    return _remask(cloud, keep)


@partial(jax.jit, static_argnames=("mean_k",))
def statistical_outlier_removal(cloud: PointCloud, mean_k: int, stddev_mul_thresh) -> PointCloud:
    """pcl::StatisticalOutlierRemoval semantics: per-point mean distance to
    its ``mean_k`` nearest neighbors; keep points whose mean distance is below
    global_mean + stddev_mul_thresh * global_std.

    PCL's kd-tree searchers include the query point itself in k-NN results,
    so we request mean_k+1 neighbors and drop the zero self-distance.
    """
    xyz = cloud.valid_xyz()
    _, d2 = knn.knn(xyz, xyz, mean_k + 1)
    dists = jnp.sqrt(jnp.clip(d2[:, 1:], 0.0, None))  # drop self
    mean_d = jnp.mean(dists, axis=-1)
    valid = cloud.mask
    n = jnp.clip(jnp.sum(valid), 1, None)
    g_mean = jnp.sum(jnp.where(valid, mean_d, 0.0)) / n
    g_sq = jnp.sum(jnp.where(valid, mean_d * mean_d, 0.0)) / n
    # PCL uses the unbiased-ish sqrt(sq_sum/n - mean^2) estimator
    g_std = jnp.sqrt(jnp.clip(g_sq - g_mean * g_mean, 0.0, None))
    keep = mean_d <= (g_mean + stddev_mul_thresh * g_std)
    return _remask(cloud, keep)


@jax.jit
def radius_outlier_removal(cloud: PointCloud, radius, min_neighbors) -> PointCloud:
    """pcl::RadiusOutlierRemoval: keep points with >= min_neighbors other
    points within ``radius`` (PCL counts the point itself in radiusSearch and
    compares count > min_neighbors... it keeps if neighbors >= min_pts where
    the self-match is included; we subtract the self-match to be explicit)."""
    xyz = cloud.valid_xyz()
    counts = knn.radius_count(xyz, xyz, radius) - 1  # exclude self
    keep = counts >= min_neighbors
    return _remask(cloud, keep)


@jax.jit
def plane_clip(cloud: PointCloud, plane_coeffs, negative: bool) -> PointCloud:
    """Half-space clip: signed distance n.p + d > 0 selected when
    negative=False is *removed*... Matching the reference exactly:
    pcl::PlaneClipper3D::clipPointCloud3D returns indices of points with
    positive signed distance; ExtractIndices with setNegative(negative)
    keeps them when negative=False and drops them when negative=True.
    """
    sd = cloud.xyz @ plane_coeffs[:3] + plane_coeffs[3]
    inside = sd > 0
    keep = jnp.logical_xor(inside, negative)
    return _remask(cloud, keep)


@jax.jit
def deskew(cloud: PointCloud, ang_vel, scan_period) -> PointCloud:
    """IMU deskewing (prefiltering_nodelet.cpp:213-243): each point i at
    relative time t_i = scan_period * i / N is unrotated by the IMU angular
    velocity: p <- Rot(ang_vel * t_i)^T p. The reference linearizes with
    small-angle quaternion (1, wx t/2, wy t/2, wz t/2); we reproduce that.
    """
    n = cloud.xyz.shape[0]
    # the reference indexes points in delivery order and divides by
    # cloud->size() (the valid count), not the padded capacity; padded tail
    # is inert either way
    count = jnp.clip(jnp.sum(cloud.mask), 1, None).astype(cloud.xyz.dtype)
    t = scan_period * jnp.arange(n, dtype=cloud.xyz.dtype) / count
    half = 0.5 * t[:, None] * ang_vel[None, :]  # quaternion vector part
    w = jnp.ones_like(t)
    q = jnp.concatenate([w[:, None], half], axis=-1)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # conjugate rotation applied to each point: v' = q^-1 * v * q
    qw, qv = q[:, 0:1], -q[:, 1:]  # inverse quaternion (unit)
    v = cloud.xyz
    tcross = 2.0 * jnp.cross(qv, v)
    xyz = v + qw * tcross + jnp.cross(qv, tcross)
    xyz = jnp.where(cloud.mask[:, None], xyz, PAD_COORD)
    return PointCloud(xyz=xyz, mask=cloud.mask, intensity=cloud.intensity)
