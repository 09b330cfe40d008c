"""Map cloud assembly.

Equivalent of MapCloudGenerator (src/hdl_graph_slam/map_cloud_generator.cpp:
13-51): transform every keyframe snapshot's cloud by its optimized pose,
concatenate, and (resolution > 0) downsample by occupied-voxel centers —
the pcl::octree getOccupiedVoxelCenters behavior.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core import cloud as cloudlib
from ..ops import voxel
from .keyframe import KeyFrameSnapshot


class MapCloudGenerator:
    def generate(
        self,
        snapshots: List[KeyFrameSnapshot],
        resolution: float = 0.05,
        max_points: int = 1 << 21,
    ) -> Optional[np.ndarray]:
        """Returns the assembled map as (n, 3) numpy, or None if empty."""
        if not snapshots:
            return None
        parts = []
        for snap in snapshots:
            moved = cloudlib.transform(snap.cloud, jnp.asarray(snap.pose, snap.cloud.xyz.dtype))
            parts.append(moved.to_numpy())
        merged = np.concatenate(parts, axis=0)
        if merged.shape[0] == 0:
            return None
        if resolution <= 0.0:
            return merged  # full resolution (map_cloud_generator.cpp:37)
        cap = 1
        while cap < min(merged.shape[0], max_points):
            cap *= 2
        cloud = cloudlib.from_numpy(merged[:max_points], capacity=cap)
        out = voxel.occupied_voxel_centers(cloud, resolution, max_voxels=cap)
        return out.to_numpy()
