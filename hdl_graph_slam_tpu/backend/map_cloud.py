"""Map cloud assembly.

Equivalent of MapCloudGenerator (src/hdl_graph_slam/map_cloud_generator.cpp:
13-51): transform every keyframe snapshot's cloud by its optimized pose,
concatenate, and (resolution > 0) downsample by occupied-voxel centers —
the pcl::octree getOccupiedVoxelCenters behavior.

TPU mapping: when all snapshot clouds share one capacity (the normal case —
the prefilter emits fixed-capacity clouds), the whole assembly is ONE
jitted program: a batched (K, N, 3) pose transform + a single
occupied-voxel-center pass, one dispatch and one D2H instead of one
round-trip per keyframe (the reference's per-keyframe transformPointCloud
loop is host-latency-free on CPU; through a remote-dispatch tunnel K round
trips dominate everything else).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import cloud as cloudlib
from ..core.cloud import PAD_COORD, PointCloud
from ..ops import voxel
from .keyframe import KeyFrameSnapshot


@partial(jax.jit, static_argnames=("resolution_zero", "max_voxels"))
def _assemble(xyz, mask, poses, resolution, resolution_zero: bool, max_voxels: int):
    """(K, N, 3) clouds + (K, 4, 4) poses -> map points (padded + mask)."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    moved = jnp.einsum("kij,knj->kni", R, xyz) + t[:, None, :]
    moved = jnp.where(mask[:, :, None], moved, PAD_COORD)
    flat = PointCloud(xyz=moved.reshape(-1, 3), mask=mask.reshape(-1))
    if resolution_zero:
        return flat.xyz, flat.mask
    out = voxel.occupied_voxel_centers(flat, resolution, max_voxels=max_voxels)
    return out.xyz, out.mask


class MapCloudGenerator:
    def generate(
        self,
        snapshots: List[KeyFrameSnapshot],
        resolution: float = 0.05,
        max_points: int = 1 << 21,
    ) -> Optional[np.ndarray]:
        """Returns the assembled map as (n, 3) numpy, or None if empty.

        The output voxel table is capped at next_pow2(min(points,
        max_points)); if the map has more occupied voxels than that, the
        lowest-key voxels win deterministically (repo-wide overflow rule) —
        raise max_points for city-scale maps at fine resolutions."""
        if not snapshots:
            return None
        caps = {snap.cloud.capacity for snap in snapshots}
        if len(caps) == 1:
            # fast path: one program for the whole map (see module docstring)
            k = len(snapshots)
            kpad = 1
            while kpad < k:
                kpad *= 2
            xyz = jnp.stack([s.cloud.xyz for s in snapshots] + [snapshots[0].cloud.xyz] * (kpad - k))
            mask = jnp.stack(
                [s.cloud.mask for s in snapshots]
                + [jnp.zeros_like(snapshots[0].cloud.mask)] * (kpad - k)
            )
            poses = jnp.asarray(
                np.stack([s.pose for s in snapshots] + [np.eye(4)] * (kpad - k)), xyz.dtype
            )
            total = kpad * snapshots[0].cloud.capacity
            cap = 1
            while cap < min(total, max_points):
                cap *= 2
            out_xyz, out_mask = _assemble(
                xyz, mask, poses, jnp.asarray(resolution, xyz.dtype),
                resolution_zero=resolution <= 0.0, max_voxels=cap,
            )
            out_xyz = np.asarray(out_xyz)
            out_mask = np.asarray(out_mask)
            pts = out_xyz[out_mask]
            return pts if pts.shape[0] else None

        # mixed capacities (e.g. loaded dumps): per-snapshot transform.
        # Overflow policy matches the fast path: ALL points are voxelized
        # and the voxel table is capped at next_pow2(min(points,
        # max_points)) — when occupied voxels exceed the cap the
        # lowest-key voxels win deterministically (the repo-wide voxel
        # overflow rule, ops/voxel.py), the same clouds produce the same
        # map regardless of which path ran.
        parts = []
        for snap in snapshots:
            moved = cloudlib.transform(snap.cloud, jnp.asarray(snap.pose, snap.cloud.xyz.dtype))
            parts.append(moved.to_numpy())
        merged = np.concatenate(parts, axis=0)
        if merged.shape[0] == 0:
            return None
        if resolution <= 0.0:
            return merged  # full resolution (map_cloud_generator.cpp:37)
        in_cap = 1
        while in_cap < merged.shape[0]:
            in_cap *= 2
        cap = 1
        while cap < min(merged.shape[0], max_points):
            cap *= 2
        cloud = cloudlib.from_numpy(merged, capacity=in_cap)
        out = voxel.occupied_voxel_centers(cloud, resolution, max_voxels=cap)
        return out.to_numpy()
