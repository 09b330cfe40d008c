"""Voxelized GICP with fast_gicp::FastVGICP semantics, TPU-native.

Reference usage: src/hdl_graph_slam/registrations.cpp:48-56 (FAST_VGICP /
FAST_VGICP_CUDA): reg_resolution voxel size, otherwise GICP parameters.

Algorithm (Koide et al. 2021): the target's per-point GICP covariances are
aggregated per voxel (mean of point means, mean of point covariances —
fast_gicp GaussianVoxel ADDITIVE mode); each source point matches its
containing voxel directly (no NN search in the iteration loop), then the
usual distribution-to-distribution Mahalanobis LM.

This maps even better onto TPU than GICP: the per-iteration correspondence
is a binary search into the sorted voxel table instead of a brute-force NN,
so the compute is dominated by the batched 3x3 algebra on the VPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.cloud import PAD_COORD, PointCloud
from ..ops import voxel as voxelops
from .base import AlignResult, lm_loop
from .gicp import GicpCloud, _inv3x3, preprocess as gicp_preprocess

_INVALID_KEY = voxelops._LOCAL_INVALID


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VgicpTarget:
    keys: jax.Array  # (V,) sorted int32 local voxel keys (ops/voxel.py)
    means: jax.Array  # (V, 3)
    covs: jax.Array  # (V, 3, 3) voxel-aggregated GICP covariances
    mask: jax.Array  # (V,)
    resolution: jax.Array
    origin: jax.Array  # (3,) int32 local-grid anchor
    # flat (G^3,) dense cell->row grid: O(1) per-iteration correspondence
    # (one gather) instead of a log2(V) binary search; None = search path.
    grid: jax.Array | None = None


@partial(jax.jit, static_argnames=("max_voxels", "k", "grid_size"))
def preprocess_target(
    cloud: PointCloud, resolution, max_voxels: int = 8192, k: int = 20,
    grid_size: int = voxelops.DENSE_GRID_SIZE,
) -> VgicpTarget:
    """Per-point GICP covariances -> voxel-aggregated Gaussians.

    Voxel addressing uses the target-anchored int32 local keys (native int32
    sort/searchsorted on TPU, no x64 in the per-iteration lookup). With
    grid_size > 0 the per-iteration lookup is one dense-grid gather; voxels
    beyond grid_size*resolution meters from the min occupied cell are then
    unreachable (not-found), mirroring the 1024^3 local-grid bound."""
    gc = gicp_preprocess(cloud, k=k)
    origin = voxelops.local_origin(cloud.xyz, cloud.mask, resolution)
    keys = voxelops.pack_local_keys(voxelops.local_cells(cloud.xyz, resolution), origin, cloud.mask)
    keys_s, order = voxelops.sort_with_order(keys)
    valid_s = keys_s != _INVALID_KEY
    xyz_s = jnp.where(valid_s[:, None], cloud.xyz[order], 0.0)
    covs_s = jnp.where(valid_s[:, None, None], gc.covs[order], 0.0)

    starts = jnp.concatenate([jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]])
    seg = jnp.cumsum(starts.astype(jnp.int32)) - 1
    acc = jax.ops.segment_sum(
        jnp.concatenate([xyz_s, valid_s.astype(xyz_s.dtype)[:, None], covs_s.reshape(-1, 9)], axis=1),
        seg, num_segments=max_voxels, indices_are_sorted=True,
    )
    counts = acc[:, 3]
    mean = acc[:, :3] / jnp.clip(counts[:, None], 1.0, None)
    cov = acc[:, 4:].reshape(-1, 3, 3) / jnp.clip(counts[:, None, None], 1.0, None)
    seg_keys = voxelops._segment_keys(keys_s, seg, max_voxels)
    vmask = (counts > 0) & (seg_keys != _INVALID_KEY)
    final_keys = jnp.where(vmask, seg_keys, _INVALID_KEY)
    grid = voxelops.build_dense_grid(final_keys, vmask, grid_size) if grid_size else None
    return VgicpTarget(
        keys=final_keys,
        means=jnp.where(vmask[:, None], mean, PAD_COORD),
        covs=cov,
        mask=vmask,
        # cloud dtype, NOT bare asarray: under x64 that is strong f64 and
        # poisons the per-iteration local_cells division into emulated f64
        resolution=jnp.asarray(resolution, dtype=cloud.xyz.dtype),
        origin=origin,
        grid=grid,
    )


def _correspond(tgt: VgicpTarget, moved: jax.Array, mask: jax.Array):
    keys = voxelops.pack_local_keys(voxelops.local_cells(moved, tgt.resolution), tgt.origin, mask)
    if tgt.grid is not None:
        return voxelops.lookup_dense(tgt.grid, keys, voxelops.grid_dim(tgt.grid))
    idx = jnp.clip(voxelops.searchsorted32(tgt.keys, keys), 0, tgt.keys.shape[0] - 1)
    found = (tgt.keys[idx] == keys) & tgt.mask[idx] & mask
    return idx, found


from typing import NamedTuple


class VgicpCorr(NamedTuple):
    idx: jax.Array
    Mw: jax.Array  # gated mahalanobis, fixed during LM trials
    num: jax.Array


def _associate(T, src: GicpCloud, tgt: VgicpTarget) -> VgicpCorr:
    R = T[:3, :3]
    t = T[:3, 3]
    moved = src.xyz @ R.T + t
    idx, found = _correspond(tgt, moved, src.mask)
    cov_b = tgt.covs[idx]
    RCA = jnp.einsum("ij,njk,lk->nil", R, src.covs, R)
    M = _inv3x3(cov_b + RCA)
    Mw = M * found.astype(T.dtype)[:, None, None]
    return VgicpCorr(idx=idx, Mw=Mw, num=jnp.sum(found.astype(jnp.int32)))


def _linearize_at(T, corr: VgicpCorr, src: GicpCloud, tgt: VgicpTarget):
    R = T[:3, :3]
    t = T[:3, 3]
    moved = src.xyz @ R.T + t
    e = tgt.means[corr.idx] - moved
    skew = se3.hat(moved)
    J = jnp.concatenate([-jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), skew.shape), skew], axis=-1)
    MJ = jnp.einsum("nij,njk->nik", corr.Mw, J)
    H = jnp.einsum("nji,njk->ik", J, MJ)
    b = jnp.einsum("nji,njk,nk->i", J, corr.Mw, e)
    cost = jnp.einsum("ni,nij,nj->", e, corr.Mw, e)
    return H, b, cost, corr.num


def _cost_at(T, corr: VgicpCorr, src: GicpCloud, tgt: VgicpTarget):
    R = T[:3, :3]
    t = T[:3, 3]
    moved = src.xyz @ R.T + t
    e = tgt.means[corr.idx] - moved
    return jnp.einsum("ni,nij,nj->", e, corr.Mw, e)


@partial(jax.jit, static_argnames=("max_iterations", "reassoc_displacement"))
def align(
    tgt: VgicpTarget,
    src: GicpCloud,
    guess: jax.Array,
    transformation_epsilon=0.01,
    max_iterations: int = 64,
    lm_init_lambda_factor=1e-9,
    reassoc_displacement: float = 0.0,
) -> AlignResult:
    """reassoc_displacement: see gicp.align / base.lm_loop (0.0 = fast_gicp
    per-iteration re-association)."""
    r_max = None
    if reassoc_displacement:
        r_max = jnp.sqrt(jnp.max(jnp.where(src.mask, jnp.sum(src.xyz * src.xyz, axis=-1), 0.0)))
    return lm_loop(
        associate=lambda T: _associate(T, src, tgt),
        linearize_at=lambda T, corr: _linearize_at(T, corr, src, tgt),
        cost_at=lambda T, corr: _cost_at(T, corr, src, tgt),
        guess=guess,
        max_iterations=max_iterations,
        transformation_epsilon=transformation_epsilon,
        lm_init_lambda_factor=lm_init_lambda_factor,
        reassoc_displacement=reassoc_displacement,
        r_max=r_max,
    )
