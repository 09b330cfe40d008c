"""Frame-to-keyframe scan-matching odometry.

Equivalent of ScanMatchingOdometryNodelet::matching
(apps/scan_matching_odometry_nodelet.cpp:165-262), including:
- first-frame keyframe bootstrap;
- init-guess injection (prev_trans * external delta — the msf/odometry hook);
- convergence gate: non-converged frames are ignored, pose propagated as
  keyframe_pose * prev_trans;
- transform thresholding (max_acceptable_trans / max_acceptable_angle with
  the reference's acos(q.w) angle measure);
- keyframe switching on delta trans/angle/time, which re-targets the
  registration (kd-tree rebuild in the reference = target preprocessing
  here).

Host-side sequential driver (odometry is inherently frame-serial through
prev_trans, SURVEY.md §7); all numerics run in jitted device programs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..core.cloud import PointCloud
from ..core.config import OdometryConfig
from ..ops import voxel
from ..registration.factory import Registration


class OdometryStatus(NamedTuple):
    """ScanMatchingStatus equivalent (msg/ScanMatchingStatus.msg).

    prediction_labels/prediction_errors mirror the reference's per-guess-
    source fields (scan_matching_odometry_nodelet.cpp:325-333): one entry
    per active init-guess source ("imu" from the MSF/EKF hook, "odometry"
    from a robot-odometry tf), error = T_final^-1 * predicted_delta.
    """

    has_converged: bool
    matching_error: float
    inlier_fraction: float
    relative_pose: np.ndarray
    prediction_labels: tuple
    prediction_errors: tuple

    @property
    def prediction_error(self) -> Optional[np.ndarray]:
        """First prediction error (back-compat convenience)."""
        return self.prediction_errors[0] if self.prediction_errors else None


class ScanMatchingOdometry:
    def __init__(self, cfg: Optional[OdometryConfig] = None, max_voxels: int = 16384):
        self.cfg = cfg or OdometryConfig()
        self.registration = Registration(self.cfg.registration, max_voxels=max_voxels)
        self.keyframe: Optional[PointCloud] = None
        self.keyframe_pose = np.eye(4)
        self.keyframe_stamp: float = 0.0
        self.prev_time: float = 0.0
        self.prev_trans = np.eye(4)
        self.last_status: Optional[OdometryStatus] = None

    def _downsample(self, cloud: PointCloud) -> PointCloud:
        cfg = self.cfg
        if cfg.downsample_method == "VOXELGRID":
            return voxel.voxel_downsample(cloud, cfg.downsample_resolution, max_voxels=cloud.capacity)
        return cloud

    def step(
        self,
        stamp: float,
        cloud: PointCloud,
        msf_delta: Optional[np.ndarray] = None,
        msf_source: str = "imu",
    ) -> np.ndarray:
        """Process one frame; returns the odometry pose (4x4 numpy).

        ``msf_source`` labels the init-guess provider for the status message
        ("imu" for the MSF/EKF hook, "odometry" for a robot-odometry delta —
        scan_matching_odometry_nodelet.cpp:185,203)."""
        cfg = self.cfg
        if self.keyframe is None:
            self.prev_time = 0.0
            self.prev_trans = np.eye(4)
            self.keyframe_pose = np.eye(4)
            self.keyframe_stamp = stamp
            self.keyframe = self._downsample(cloud)
            self.registration.set_target(self.keyframe)
            return np.eye(4)

        filtered = self._downsample(cloud)
        guess = self.prev_trans @ (msf_delta if msf_delta is not None else np.eye(4))
        result = self.registration.align(filtered, guess=jnp.asarray(guess, filtered.xyz.dtype))

        converged = bool(result.converged)
        trans = np.asarray(result.transformation, dtype=np.float64)
        self._publish_status(result, msf_delta, msf_source)

        if not converged:
            # scan matching has not converged -> ignore frame
            return self.keyframe_pose @ self.prev_trans

        odom = self.keyframe_pose @ trans

        if cfg.transform_thresholding:
            delta = np.linalg.inv(self.prev_trans) @ trans
            dx = np.linalg.norm(delta[:3, 3])
            da = float(np.arccos(np.clip(_quat_w(delta[:3, :3]), -1.0, 1.0)))
            if dx > cfg.max_acceptable_trans or da > cfg.max_acceptable_angle:
                return self.keyframe_pose @ self.prev_trans

        self.prev_time = stamp
        self.prev_trans = trans

        delta_trans = float(np.linalg.norm(trans[:3, 3]))
        delta_angle = float(np.arccos(np.clip(_quat_w(trans[:3, :3]), -1.0, 1.0)))
        delta_time = stamp - self.keyframe_stamp
        if (
            delta_trans > cfg.keyframe_delta_trans
            or delta_angle > cfg.keyframe_delta_angle
            or delta_time > cfg.keyframe_delta_time
        ):
            self.keyframe = filtered
            self.registration.set_target(self.keyframe)
            self.keyframe_pose = odom
            self.keyframe_stamp = stamp
            self.prev_time = stamp
            self.prev_trans = np.eye(4)

        return odom

    def _publish_status(self, result, msf_delta, msf_source):
        """ScanMatchingStatus fields (scan_matching_odometry_nodelet.cpp:
        298-335): fitness, inlier fraction at 0.5 m, labeled prediction
        errors T^-1 * msf_delta per active guess source (:325-333)."""
        T = np.asarray(result.transformation, dtype=np.float64)
        labels, errors = (), ()
        if msf_delta is not None:
            labels = (msf_source,)
            errors = (np.linalg.inv(T) @ np.asarray(msf_delta, dtype=np.float64),)
        self.last_status = OdometryStatus(
            has_converged=bool(result.converged),
            matching_error=float(result.error),
            inlier_fraction=float(result.num_inliers) / max(1, int(self.keyframe.count)),
            relative_pose=T,
            prediction_labels=labels,
            prediction_errors=errors,
        )


def _quat_w(R: np.ndarray) -> float:
    """w component of the rotation quaternion (reference's angle measure)."""
    tr = np.trace(R)
    return 0.5 * np.sqrt(max(0.0, 1.0 + tr))
