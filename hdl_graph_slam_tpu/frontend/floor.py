"""Floor plane detection per frame.

Equivalent of FloorDetectionNodelet::detect
(apps/floor_detection_nodelet.cpp:110-180): tilt compensation, double
height clip around sensor_height, optional normal prefiltering (k=10 PCA
normals vs vertical), batched RANSAC plane fit, inlier-count and
verticality acceptance gates, upward normal orientation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import cloud as cloudlib
from ..core.cloud import PointCloud
from ..core.config import FloorDetectionConfig
from ..ops import filters, normals, ransac


class FloorDetector:
    def __init__(self, cfg: Optional[FloorDetectionConfig] = None):
        self.cfg = cfg or FloorDetectionConfig()
        self._key = jax.random.PRNGKey(0)
        self._prefilter_jit = None  # fused tilt/clip/normal-filter program

    def _build_prefilter(self, tilt_matrix: np.ndarray):
        cfg = self.cfg

        def run(cloud: PointCloud) -> PointCloud:
            dtype = cloud.xyz.dtype
            c = cloudlib.transform(cloud, jnp.asarray(tilt_matrix, dtype))
            # clip to a band around -sensor_height (the floor sits below
            # the sensor): keep z in [-h - range, -h + range]
            c = filters.plane_clip(
                c, jnp.asarray([0.0, 0.0, 1.0, cfg.sensor_height + cfg.height_clip_range], dtype), negative=False
            )
            c = filters.plane_clip(
                c, jnp.asarray([0.0, 0.0, 1.0, cfg.sensor_height - cfg.height_clip_range], dtype), negative=True
            )
            if cfg.use_normal_filtering:
                c = self._normal_filter(c)
            c = cloudlib.transform(c, jnp.asarray(np.linalg.inv(tilt_matrix), dtype))
            return cloudlib.compact(c)

        return jax.jit(run)

    def detect(self, cloud: PointCloud) -> Optional[np.ndarray]:
        """Returns floor coeffs (4,) with n.p + d = 0 and upward normal, or
        None if no acceptable floor (reference returns boost::none)."""
        cfg = self.cfg

        tilt = np.deg2rad(cfg.tilt_deg)
        R = np.array(
            [
                [np.cos(tilt), 0.0, np.sin(tilt)],
                [0.0, 1.0, 0.0],
                [-np.sin(tilt), 0.0, np.cos(tilt)],
            ]
        )
        tilt_matrix = np.eye(4)
        tilt_matrix[:3, :3] = R

        if self._prefilter_jit is None:
            self._prefilter_jit = self._build_prefilter(tilt_matrix)
        c = self._prefilter_jit(cloud)

        if int(c.count) < cfg.floor_pts_thresh:
            return None

        self._key, sub = jax.random.split(self._key)
        res = ransac.fit_plane(c, sub, distance_thresh=cfg.ransac_distance_thresh, num_hypotheses=cfg.ransac_hypotheses)

        if int(res.num_inliers) < cfg.floor_pts_thresh:
            return None

        coeffs = np.asarray(res.coeffs, dtype=np.float64)

        # verticality gate vs the tilt-compensated vertical
        reference = np.linalg.inv(tilt_matrix) @ np.array([0.0, 0.0, 1.0, 0.0])
        dot = abs(float(coeffs[:3] @ reference[:3]))
        if dot < np.cos(np.deg2rad(cfg.floor_normal_thresh)):
            return None

        # make the normal upward
        if coeffs[2] < 0.0:
            coeffs = -coeffs
        return coeffs

    def _normal_filter(self, cloud: PointCloud) -> PointCloud:
        cfg = self.cfg
        n = normals.estimate_normals(cloud, k=10, viewpoint=jnp.asarray([0.0, 0.0, cfg.sensor_height], cloud.xyz.dtype))
        dot = jnp.abs(n[:, 2])
        keep = dot > jnp.cos(jnp.deg2rad(cfg.normal_filter_thresh))
        mask = cloud.mask & keep
        xyz = jnp.where(mask[:, None], cloud.xyz, cloudlib.PAD_COORD)
        return PointCloud(xyz=xyz, mask=mask, intensity=cloud.intensity)
