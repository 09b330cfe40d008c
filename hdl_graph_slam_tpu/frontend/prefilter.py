"""Prefiltering stage: raw scan -> conditioned cloud.

Equivalent of PrefilteringNodelet (apps/prefiltering_nodelet.cpp:106-243):
optional IMU deskewing, base_link transform, distance band-pass, voxel
downsample, outlier removal. One fused jitted program per configuration —
where the reference chains four PCL filters with intermediate clouds, XLA
fuses the masked pipeline into a handful of kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import cloud as cloudlib
from ..core.cloud import PointCloud
from ..core.config import PrefilterConfig
from ..ops import filters, voxel


def make_prefilter_fn(cfg: PrefilterConfig, out_capacity: int):
    """Pure (traceable) prefilter chain for ``cfg``: can be jitted standalone
    (Prefilter below) or inlined into a larger program (frontend/window.py)."""

    # Static routing: after the distance filter, every point lies within
    # distance_far_thresh of the base origin, so if 2*far/res (+slack) fits
    # the 1024-cell local grid the downsample can use native int32 keys
    # (no emulated int64 sort, no x64 requirement) with bit-identical output.
    use_local_keys = cfg.use_distance_filter and voxel.local_grid_fits(
        2.0 * cfg.distance_far_thresh, cfg.downsample_resolution
    )

    def run(cloud: PointCloud, base_to_sensor, ang_vel) -> PointCloud:
        if cfg.deskewing:
            cloud = filters.deskew(cloud, ang_vel, cfg.scan_period)
        cloud = cloudlib.transform(cloud, base_to_sensor)
        if cfg.use_distance_filter:
            cloud = filters.distance_filter(cloud, cfg.distance_near_thresh, cfg.distance_far_thresh)
        if cfg.downsample_method in ("VOXELGRID", "APPROX_VOXELGRID"):
            # ApproximateVoxelGrid differs from VoxelGrid only in hashing
            # approximations PCL makes for speed; the exact centroid grid
            # serves both (it is not slower here).
            downsample = voxel.voxel_downsample_local if use_local_keys else voxel.voxel_downsample
            cloud = downsample(cloud, cfg.downsample_resolution, max_voxels=out_capacity)
        else:
            cloud = cloudlib.compact(cloud, capacity=out_capacity)
        if cfg.outlier_removal_method == "STATISTICAL":
            cloud = filters.statistical_outlier_removal(cloud, cfg.statistical_mean_k, cfg.statistical_stddev)
        elif cfg.outlier_removal_method == "RADIUS":
            cloud = filters.radius_outlier_removal(cloud, cfg.radius_radius, cfg.radius_min_neighbors)
        return cloud

    return run


class Prefilter:
    """Host-side wrapper holding the config; `__call__` runs on device."""

    def __init__(self, cfg: Optional[PrefilterConfig] = None, out_capacity: int = 16384):
        self.cfg = cfg or PrefilterConfig()
        self.out_capacity = out_capacity
        self._fused = None  # single compiled program for the whole chain

    def _build_fused(self):
        return jax.jit(make_prefilter_fn(self.cfg, self.out_capacity))

    def __call__(
        self,
        cloud: PointCloud,
        base_to_sensor: Optional[jax.Array] = None,
        ang_vel: Optional[jax.Array] = None,
    ) -> PointCloud:
        if self._fused is None:
            self._fused = self._build_fused()
        dtype = cloud.xyz.dtype
        if base_to_sensor is None:
            base_to_sensor = jnp.eye(4, dtype=dtype)
        if ang_vel is None:
            ang_vel = jnp.zeros(3, dtype)
        return self._fused(
            cloud, jnp.asarray(base_to_sensor, dtype), jnp.asarray(ang_vel, dtype)
        )
