"""Fixed-shape padded point-cloud tensors.

The reference passes dynamically sized pcl::PointCloud<PointXYZI> between
stages. On TPU every jitted program needs static shapes, so a cloud is a
(capacity, 3) float32 array plus a validity mask; capacities are bucketed to
a small set of sizes to bound XLA recompilation. Padding points are parked at
a large sentinel coordinate so distance-based kernels naturally ignore them,
and every op also carries the mask for exact counting semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Padding points live far outside any plausible LiDAR return so that
# nearest-neighbor style kernels never select them even without masking.
PAD_COORD = 1.0e6

# Capacity buckets (points per cloud after each stage). Powers of two keep
# Pallas/MXU tiling aligned; 2^17 covers a raw 64-beam scan.
DEFAULT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """A padded point cloud. ``xyz[i]`` is valid iff ``mask[i]``.

    intensity is optional (None for clouds where it was never populated);
    it rides along through filters like PCL's PointXYZI intensity channel.
    """

    xyz: jax.Array  # (N, 3) float32
    mask: jax.Array  # (N,) bool
    intensity: Optional[jax.Array] = None  # (N,) float32 or None

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def valid_xyz(self) -> jax.Array:
        """xyz with padding rows forced to the sentinel coordinate."""
        return jnp.where(self.mask[:, None], self.xyz, PAD_COORD)

    def to_numpy(self) -> np.ndarray:
        """Extract the valid points as a dense (count, 3) numpy array."""
        m = np.asarray(self.mask)
        return np.asarray(self.xyz)[m]


def bucket_capacity(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(buckets[-1])


def from_numpy(
    points: np.ndarray,
    capacity: Optional[int] = None,
    intensity: Optional[np.ndarray] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    dtype=np.float32,
) -> PointCloud:
    """Pad a (n, 3) array into a bucketed PointCloud."""
    points = np.asarray(points, dtype=dtype).reshape(-1, 3)
    n = points.shape[0]
    cap = capacity if capacity is not None else bucket_capacity(n, buckets)
    if n > cap:
        # uniform strided subsample, NOT head truncation: spinning-lidar
        # points arrive ring-major, so taking the first `cap` rows would
        # systematically drop the upper rings (all vertical structure) —
        # exactly the scans that constrain horizontal motion.
        sel = np.linspace(0, n - 1, cap).round().astype(np.int64)
        points = points[sel]
        if intensity is not None:
            intensity = np.asarray(intensity).reshape(-1)[sel]
        n = cap
    n_keep = n
    xyz = np.full((cap, 3), PAD_COORD, dtype=dtype)
    xyz[:n_keep] = points[:n_keep]
    mask = np.zeros((cap,), dtype=bool)
    mask[:n_keep] = True
    inten = None
    if intensity is not None:
        intensity = np.asarray(intensity, dtype=dtype).reshape(-1)
        inten = np.zeros((cap,), dtype=dtype)
        inten[:n_keep] = intensity[:n_keep]
    return PointCloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask), intensity=None if inten is None else jnp.asarray(inten))


def transform(cloud: PointCloud, T: jax.Array) -> PointCloud:
    """Rigidly transform a cloud (padding stays at the sentinel)."""
    R = T[:3, :3]
    t = T[:3, 3]
    xyz = cloud.xyz @ R.T + t
    xyz = jnp.where(cloud.mask[:, None], xyz, PAD_COORD)
    return PointCloud(xyz=xyz, mask=cloud.mask, intensity=cloud.intensity)


def compact(cloud: PointCloud, capacity: Optional[int] = None) -> PointCloud:
    """Move valid points to the front (stable), keeping static shapes.

    Equivalent of PCL filters' output repacking: after masking ops the valid
    points are scattered; sorting by (!mask) compacts them while preserving
    order, entirely on device.
    """
    cap = capacity or cloud.capacity
    order = jnp.argsort(jnp.logical_not(cloud.mask), stable=True)
    order = order[:cap]
    xyz = jnp.where(cloud.mask[order][:, None], cloud.xyz[order], PAD_COORD)
    mask = cloud.mask[order]
    inten = None if cloud.intensity is None else jnp.where(mask, cloud.intensity[order], 0.0)
    return PointCloud(xyz=xyz, mask=mask, intensity=inten)
