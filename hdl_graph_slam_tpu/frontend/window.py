"""Windowed device-resident odometry: K frames per dispatch.

The per-frame DeviceOdometry path (odometry_device.py) is one dispatch per
frame; through a remote-dispatch tunnel (axon) or any host-latency-bound
deployment, per-frame dispatch latency — not device compute — sets the
frame rate. For offline replay (the reference's bag_player.py throughput
mode, src/hdl_graph_slam/bag_player.py:147-163) and for any pipelined
deployment where scans are staged ahead, this module runs the FULL frame
step (fused prefilter + GICP odometry + gates + keyframe switching,
scan_matching_odometry_nodelet.cpp:165-262) for a window of K frames inside
ONE jitted program via lax.scan: a single H2D stage of the raw scans, a
single dispatch, K poses back.

Frame-to-frame sequencing (prev_trans as the next init guess, on-chip
keyframe switching) is preserved exactly — lax.scan is sequential; the win
is purely amortizing dispatch/transfer latency over the window, so the
measured frames/s is device throughput, not tunnel latency.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cloud import PAD_COORD, PointCloud
from ..core.config import OdometryConfig, PrefilterConfig
from .odometry_device import OdomState, device_step_impl, make_method_fns
from .prefilter import make_prefilter_fn


def stack_scans(scans, capacity: int, dtype=np.float32):
    """Pad a list of (n_i, 3) raw scans into (K, capacity, 3) xyz + (K, capacity)
    mask numpy arrays, ready for a single H2D transfer."""
    k = len(scans)
    xyz = np.full((k, capacity, 3), PAD_COORD, dtype=dtype)
    mask = np.zeros((k, capacity), dtype=bool)
    for i, s in enumerate(scans):
        s = np.asarray(s, dtype=dtype).reshape(-1, 3)
        if s.shape[0] > capacity:
            # uniform strided subsample (see core.cloud.from_numpy): head
            # truncation of ring-major lidar data drops the upper rings.
            s = s[np.linspace(0, s.shape[0] - 1, capacity).round().astype(np.int64)]
        n = s.shape[0]
        xyz[i, :n] = s[:n]
        mask[i, :n] = True
    return xyz, mask


class OdometryWindow:
    """Host wrapper around the scanned K-frame odometry program."""

    def __init__(
        self,
        cfg: Optional[OdometryConfig] = None,
        prefilter_cfg: Optional[PrefilterConfig] = None,
        out_capacity: int = 8192,
        max_voxels: int = 8192,
    ):
        self.cfg = cfg or OdometryConfig()
        self.prefilter_cfg = prefilter_cfg
        self._pf = (
            make_prefilter_fn(prefilter_cfg, out_capacity) if prefilter_cfg is not None else None
        )
        self._fns = make_method_fns(self.cfg.registration, max_voxels=max_voxels)
        self._run = None

    def _prefilter(self, cloud: PointCloud, ang_vel=None) -> PointCloud:
        if self._pf is None:
            return cloud
        dtype = cloud.xyz.dtype
        if ang_vel is None:
            ang_vel = jnp.zeros(3, dtype)
        return self._pf(cloud, jnp.eye(4, dtype=dtype), jnp.asarray(ang_vel, dtype))

    def init_state(self, stamp: float, raw_cloud: PointCloud, ang_vel=None) -> OdomState:
        """Bootstrap from the first frame (sets it as the keyframe target,
        scan_matching_odometry_nodelet.cpp:166-174). ``ang_vel`` (3,) deskews
        the bootstrap scan when the prefilter config enables deskewing."""
        prep, make_tgt, _ = self._fns
        cloud = (
            jax.jit(self._prefilter)(raw_cloud, ang_vel) if self._pf is not None else raw_cloud
        )
        tgt = make_tgt(cloud, prep(cloud))
        dtype = raw_cloud.xyz.dtype
        return OdomState(
            tgt=tgt,
            keyframe_pose=jnp.eye(4, dtype=dtype),
            prev_trans=jnp.eye(4, dtype=dtype),
            keyframe_stamp=jnp.asarray(stamp, dtype),
            prev_delta=jnp.eye(4, dtype=dtype),
        )

    def _build(self):
        c = self.cfg
        prep, make_tgt, align = self._fns

        def frame(state, inp):
            xyz, mask, stamp, ang_vel = inp
            cloud = self._prefilter(PointCloud(xyz=xyz, mask=mask), ang_vel)
            state, odom, status = device_step_impl(
                state,
                cloud,
                stamp,
                jnp.eye(4, dtype=xyz.dtype),
                prep, make_tgt, align,
                keyframe_delta_trans=c.keyframe_delta_trans,
                keyframe_delta_angle=c.keyframe_delta_angle,
                keyframe_delta_time=c.keyframe_delta_time,
                transform_thresholding=c.transform_thresholding,
                max_acceptable_trans=c.max_acceptable_trans,
                max_acceptable_angle=c.max_acceptable_angle,
                constant_velocity_guess=c.constant_velocity_guess,
            )
            # the filtered cloud rides along so the backend never has to
            # re-prefilter a frame it admits as a keyframe (the arrays stay
            # on device until a row is actually fetched)
            return state, (odom, status, cloud.xyz, cloud.mask)

        def run(state, xyz, mask, stamps, ang_vels):
            state, (odoms, status, fxyz, fmask) = jax.lax.scan(
                frame, state, (xyz, mask, stamps, ang_vels)
            )
            return state, odoms, status, fxyz, fmask

        return jax.jit(run)

    def run(self, state: OdomState, xyz, mask, stamps, ang_vel=None):
        """Process a window. xyz (K, N, 3), mask (K, N), stamps (K,) — device
        or numpy arrays. ``ang_vel`` (K, 3) per-frame IMU angular velocity for
        deskewing (prefiltering_nodelet.cpp:182-243); default zeros = no
        deskew, matching the pre-r4 behavior (and a no-op unless the
        prefilter config sets deskewing=True). Returns (new_state,
        odoms (K, 4, 4), status dict of (K, ...) arrays). One dispatch for
        the whole window."""
        state, odoms, status, _, _ = self.run_with_clouds(state, xyz, mask, stamps, ang_vel)
        return state, odoms, status

    def run_with_clouds(self, state: OdomState, xyz, mask, stamps, ang_vel=None):
        """Like :meth:`run` but also returns the per-frame PREFILTERED
        clouds as (K, out_capacity, 3) xyz + (K, out_capacity) mask device
        arrays — pipeline.run_windowed slices out the rows the backend
        admits as keyframes instead of re-running the prefilter per
        keyframe (one fewer dispatch + H2D per keyframe)."""
        if self._run is None:
            self._run = self._build()
        dtype = state.keyframe_pose.dtype
        k = jnp.shape(stamps)[0]
        if ang_vel is None:
            ang_vel = jnp.zeros((k, 3), dtype)
        return self._run(
            state,
            jnp.asarray(xyz, dtype),
            jnp.asarray(mask, bool),
            jnp.asarray(stamps, dtype),
            jnp.asarray(ang_vel, dtype),
        )
