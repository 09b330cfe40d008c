"""Registration method factory + host-side wrapper.

Equivalent of hdl_graph_slam::select_registration_method
(src/hdl_graph_slam/registrations.cpp:22-124): resolves the method string
from config and exposes the pcl::Registration-style surface the pipeline
stages use (setInputTarget / align(guess) / hasConverged /
getFinalTransformation / getFitnessScore).

Method mapping (reference -> this engine):
- FAST_GICP, GICP, GICP_OMP      -> registration.gicp  (fast_gicp semantics)
- FAST_VGICP, FAST_VGICP_CUDA    -> registration.vgicp
- ICP                            -> registration.icp
- NDT, NDT_OMP (KDTREE/DIRECT1/DIRECT7) -> registration.ndt
  (KDTREE = brute-force radius search over cell centroids, the pclomp
  kd-tree semantics; DIRECT7 remains the default — on TPU the 7-cell direct
  lookup replaces the kd-tree with equal-or-better cell coverage)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.cloud import PointCloud
from ..core.config import RegistrationConfig
from ..ops import knn
from ..ops import voxel as voxelops
from . import gicp, icp, ndt, vgicp
from .base import AlignResult


class Registration:
    """Stateful wrapper: amortizes target preprocessing across align calls,
    like pcl::Registration::setInputTarget re-building kd-trees/voxel grids
    only when the target changes (scan_matching_odometry_nodelet.cpp:250)."""

    def __init__(self, cfg: Optional[RegistrationConfig] = None, max_voxels: int = 8192):
        self.cfg = cfg or RegistrationConfig()
        self.max_voxels = max_voxels
        m = self.cfg.registration_method.upper()
        if "VGICP" in m:
            self.method = "VGICP"
        elif "GICP" in m:
            self.method = "GICP"
        elif m == "ICP":
            self.method = "ICP"
        else:
            self.method = "NDT"
        self._target_cloud: Optional[PointCloud] = None
        self._target_state = None
        self._last_result: Optional[AlignResult] = None
        self._last_source: Optional[PointCloud] = None

    # -- pcl::Registration-like surface -------------------------------------

    def set_target(self, cloud: PointCloud) -> None:
        self._target_cloud = cloud
        c = self.cfg
        if self.method == "GICP":
            self._target_state = gicp.preprocess(cloud, k=c.reg_correspondence_randomness)
        elif self.method == "VGICP":
            self._target_state = vgicp.preprocess_target(
                cloud, c.reg_resolution, max_voxels=self.max_voxels, k=c.reg_correspondence_randomness,
                grid_size=voxelops.dense_grid_size_for(c.reg_resolution, span_m=c.reg_dense_span_m or voxelops.DENSE_GRID_SPAN_M),
            )
        elif self.method == "NDT":
            self._target_state = ndt.preprocess_target(
                cloud, c.reg_resolution, max_voxels=self.max_voxels,
                grid_size=voxelops.dense_grid_size_for(c.reg_resolution, span_m=c.reg_dense_span_m or voxelops.DENSE_GRID_SPAN_M),
            )
        else:
            self._target_state = cloud

    def align(self, source: PointCloud, guess=None) -> AlignResult:
        if self._target_state is None:
            raise RuntimeError("set_target() must be called before align()")
        c = self.cfg
        if guess is None:
            guess = jnp.eye(4, dtype=source.xyz.dtype)
        guess = jnp.asarray(guess, dtype=source.xyz.dtype)
        if self.method == "GICP":
            result = _gicp_frame(
                self._target_state, source, guess,
                k=c.reg_correspondence_randomness,
                max_corr_dist=c.reg_max_correspondence_distance,
                transformation_epsilon=c.reg_transformation_epsilon,
                max_iterations=c.reg_maximum_iterations,
                reassoc_displacement=c.reg_reassoc_displacement,
            )
        elif self.method == "VGICP":
            result = _vgicp_frame(
                self._target_state, source, guess,
                k=c.reg_correspondence_randomness,
                transformation_epsilon=c.reg_transformation_epsilon,
                max_iterations=c.reg_maximum_iterations,
                reassoc_displacement=c.reg_reassoc_displacement,
            )
        elif self.method == "NDT":
            result = ndt.align(
                self._target_state, source, guess,
                transformation_epsilon=c.reg_transformation_epsilon,
                max_iterations=c.reg_maximum_iterations,
                nn_search_method=c.reg_nn_search_method,
                reassoc_displacement=c.reg_reassoc_displacement,
            )
        else:
            result = icp.align(
                self._target_state, source, guess,
                max_corr_dist=c.reg_max_correspondence_distance,
                transformation_epsilon=c.reg_transformation_epsilon,
                max_iterations=c.reg_maximum_iterations,
                use_reciprocal=c.reg_use_reciprocal_correspondences,
            )
        self._last_result = result
        self._last_source = source
        return result

    def get_fitness_score(self, max_range: float = float("inf")) -> float:
        """pcl::Registration::getFitnessScore on the last alignment."""
        if self._last_result is None or self._target_cloud is None:
            return float("inf")
        score = knn.fitness_score(
            self._target_cloud.valid_xyz(),
            self._last_source.xyz,
            self._last_source.mask,
            self._last_result.transformation,
            max_range=max_range,
        )
        return float(score)


def select_registration_method(cfg: RegistrationConfig, max_voxels: int = 8192) -> Registration:
    return Registration(cfg, max_voxels=max_voxels)


# fused per-frame programs: source preprocessing + alignment compile into one
# device program (no host round-trip between them — the per-frame hot path)
from functools import partial

import jax


@partial(jax.jit, static_argnames=("k", "max_iterations", "reassoc_displacement"))
def _gicp_frame(tgt_state, source, guess, k, max_corr_dist, transformation_epsilon, max_iterations,
                reassoc_displacement=0.0):
    src = gicp.preprocess(source, k=k)
    return gicp.align(
        tgt_state, src, guess,
        max_corr_dist=max_corr_dist,
        transformation_epsilon=transformation_epsilon,
        max_iterations=max_iterations,
        reassoc_displacement=reassoc_displacement,
    )


@partial(jax.jit, static_argnames=("k", "max_iterations", "reassoc_displacement"))
def _vgicp_frame(tgt_state, source, guess, k, transformation_epsilon, max_iterations,
                 reassoc_displacement=0.0):
    src = gicp.preprocess(source, k=k)
    return vgicp.align(
        tgt_state, src, guess,
        transformation_epsilon=transformation_epsilon,
        max_iterations=max_iterations,
        reassoc_displacement=reassoc_displacement,
    )
