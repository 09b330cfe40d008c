"""Fully device-resident scan-matching odometry.

The host-driven ScanMatchingOdometry (odometry.py) mirrors the reference's
control flow with per-frame host decisions; on hardware where every
host<->device round-trip costs real latency that serializes the pipeline.
This variant keeps the *entire* frame step on device as one jitted program:

    state' , odom, status = step(state, cloud, stamp)

- the GICP target (preprocessed keyframe) lives in device memory;
- alignment runs from the prev_trans guess (scan_matching_odometry_nodelet
  .cpp:210 semantics);
- the convergence gate, transform thresholding, and keyframe switching
  (:214-252) are lax.cond/select logic inside the program;
- on a keyframe switch the freshly preprocessed source becomes the new
  target without ever leaving the chip.

The host only feeds clouds and reads back poses (which it may do
asynchronously, letting dispatch run ahead of retrieval).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.cloud import PointCloud
from ..core.config import OdometryConfig
from ..registration import gicp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OdomState:
    tgt: gicp.GicpCloud  # current keyframe, preprocessed
    keyframe_pose: jax.Array  # (4,4)
    prev_trans: jax.Array  # (4,4) transform since keyframe
    keyframe_stamp: jax.Array  # ()


def device_step_impl(
    state: OdomState,
    cloud: PointCloud,
    stamp,
    msf_delta,
    k: int,
    max_corr_dist,
    transformation_epsilon,
    max_iterations: int,
    keyframe_delta_trans,
    keyframe_delta_angle,
    keyframe_delta_time,
    transform_thresholding,
    max_acceptable_trans,
    max_acceptable_angle,
):
    src = gicp.preprocess(cloud, k=k)
    guess = state.prev_trans @ msf_delta
    res = gicp.align(
        state.tgt, src, guess,
        max_corr_dist=max_corr_dist,
        transformation_epsilon=transformation_epsilon,
        max_iterations=max_iterations,
    )

    # convergence gate (:214-218): ignore frame, keep prev_trans
    trans = jnp.where(res.converged, res.transformation, state.prev_trans)

    # transform thresholding (:223-233) with the reference's acos(q.w) angle
    delta = se3.inverse(state.prev_trans) @ trans
    dxy = jnp.linalg.norm(delta[:3, 3])
    qw = jnp.clip(se3.quat_from_mat(delta[:3, :3])[0], -1.0, 1.0)
    da = jnp.arccos(qw)
    too_large = (dxy > max_acceptable_trans) | (da > max_acceptable_angle)
    reject = jnp.asarray(transform_thresholding) & too_large & res.converged
    trans = jnp.where(reject, state.prev_trans, trans)
    accepted = res.converged & jnp.logical_not(reject)

    odom = state.keyframe_pose @ trans

    # keyframe switch (:244-252)
    d_trans = jnp.linalg.norm(trans[:3, 3])
    qw2 = jnp.clip(se3.quat_from_mat(trans[:3, :3])[0], -1.0, 1.0)
    d_angle = jnp.arccos(qw2)
    d_time = stamp - state.keyframe_stamp
    switch = accepted & (
        (d_trans > keyframe_delta_trans) | (d_angle > keyframe_delta_angle) | (d_time > keyframe_delta_time)
    )

    eye = jnp.eye(4, dtype=odom.dtype)
    new_tgt = jax.tree_util.tree_map(
        lambda new, old: jnp.where(switch, new, old), src, state.tgt
    )
    new_state = OdomState(
        tgt=new_tgt,
        keyframe_pose=jnp.where(switch, odom, state.keyframe_pose),
        prev_trans=jnp.where(switch, eye, jnp.where(accepted, trans, state.prev_trans)),
        keyframe_stamp=jnp.where(switch, stamp, state.keyframe_stamp),
    )
    n_src = jnp.clip(jnp.sum(cloud.mask.astype(jnp.int32)), 1, None)
    status = dict(
        converged=res.converged,
        error=res.error,
        iterations=res.iterations,
        num_inliers=res.num_inliers,
        inlier_fraction=res.num_inliers.astype(odom.dtype) / n_src.astype(odom.dtype),
        keyframe_switched=switch,
        relative_pose=res.transformation,
        # ScanMatchingStatus.prediction_errors[0] semantics
        # (scan_matching_odometry_nodelet.cpp:330-332): T_final^-1 * msf_delta,
        # computed on device so reading it never forces an extra sync.
        prediction_error=se3.inverse(res.transformation) @ msf_delta,
    )
    return new_state, odom, status


_device_step = partial(jax.jit, static_argnames=("k", "max_iterations"))(device_step_impl)


class DeviceOdometry:
    """Host wrapper around the single-dispatch device step."""

    def __init__(self, cfg: Optional[OdometryConfig] = None):
        self.cfg = cfg or OdometryConfig()
        self.state: Optional[OdomState] = None
        self.last_status = None

    def step(self, stamp: float, cloud: PointCloud, msf_delta=None, msf_source: str = "imu") -> jax.Array:
        """Returns the odometry pose as a device array (no forced sync).

        ``msf_source`` labels the guess provider in last_status
        (prediction_labels, scan_matching_odometry_nodelet.cpp:326-327)."""
        c = self.cfg
        dtype = cloud.xyz.dtype
        if self.state is None:
            tgt = gicp.preprocess(cloud, k=c.registration.reg_correspondence_randomness)
            self.state = OdomState(
                tgt=tgt,
                keyframe_pose=jnp.eye(4, dtype=dtype),
                prev_trans=jnp.eye(4, dtype=dtype),
                keyframe_stamp=jnp.asarray(stamp, dtype),
            )
            return jnp.eye(4, dtype=dtype)
        have_guess = msf_delta is not None
        if msf_delta is None:
            msf_delta = jnp.eye(4, dtype=dtype)
        self.state, odom, status = _device_step(
            self.state,
            cloud,
            jnp.asarray(stamp, dtype),
            jnp.asarray(msf_delta, dtype),
            k=c.registration.reg_correspondence_randomness,
            max_corr_dist=c.registration.reg_max_correspondence_distance,
            transformation_epsilon=c.registration.reg_transformation_epsilon,
            max_iterations=c.registration.reg_maximum_iterations,
            keyframe_delta_trans=c.keyframe_delta_trans,
            keyframe_delta_angle=c.keyframe_delta_angle,
            keyframe_delta_time=c.keyframe_delta_time,
            transform_thresholding=c.transform_thresholding,
            max_acceptable_trans=c.max_acceptable_trans,
            max_acceptable_angle=c.max_acceptable_angle,
        )
        status["prediction_labels"] = (msf_source,) if have_guess else ()
        self.last_status = status
        return odom
