"""Offline pipeline driver: dataset -> prefilter -> odometry -> floor ->
backend -> trajectory/map.

Replaces the reference's ROS launch graph + bag_player.py flow control
(SURVEY.md §3.6): offline ingestion is directly file-driven and
deterministic — each frame flows through every stage synchronously, and the
backend optimization cycle fires on the reference's cadence
(graph_update_interval of stream time, default 3 s).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from .backend import FloorMeasurement, GpsMeasurement, HdlGraphSlam, ImuMeasurement
from .core import cloud as cloudlib
from .core.config import SlamConfig
from .frontend import FloorDetector, Prefilter, ScanMatchingOdometry
from .utils.metrics import GLOBAL_TIMER


@dataclasses.dataclass
class PipelineResult:
    trajectory: list  # [(stamp, 4x4)]
    odometry_trajectory: list
    num_frames: int
    num_keyframes: int
    wall_time_s: float
    frames_per_second: float


class SlamPipeline:
    """End-to-end offline SLAM over an iterator of sensor frames."""

    def __init__(self, cfg: Optional[SlamConfig] = None, cloud_capacity: int = 16384,
                 device_odometry: bool = False):
        from .core.config import wire_derived

        self.cfg = wire_derived(cfg or SlamConfig())
        self.cloud_capacity = cloud_capacity
        self.prefilter = Prefilter(self.cfg.prefilter, out_capacity=cloud_capacity)
        if device_odometry:
            from .frontend import DeviceOdometry

            self.odometry = DeviceOdometry(self.cfg.odometry)
        else:
            self.odometry = ScanMatchingOdometry(self.cfg.odometry)
        self.floor = FloorDetector(self.cfg.floor) if self.cfg.floor.enabled else None
        self.slam = HdlGraphSlam(self.cfg)
        self._last_optimize_stream_time: Optional[float] = None
        self.odometry_trajectory = []
        self.imu_predictor = None
        if self.cfg.odometry.enable_imu_frontend:
            from .frontend.imu_prediction import ImuPredictor

            self.imu_predictor = ImuPredictor()
        self._last_ang_vel = None  # for prefilter deskewing
        # external robot-odometry init guess (scan_matching_odometry_nodelet.
        # cpp:193-207): time-stamped poses in the robot_odom frame; per frame
        # the delta between the previous frame time and the current stamp
        # seeds the scan matcher (msf_source="odometry")
        self._robot_odom: list = []  # [(stamp, 4x4 pose)]
        self._prev_frame_time: Optional[float] = None

    def process_frame(self, stamp: float, xyz: np.ndarray, intensity: Optional[np.ndarray] = None) -> np.ndarray:
        if xyz is None or np.size(xyz) == 0:
            # reference skips empty clouds (prefiltering_nodelet.cpp:111-113)
            last = self.odometry_trajectory[-1][1] if self.odometry_trajectory else np.eye(4)
            return last
        with GLOBAL_TIMER.span("ingest"):
            cloud = cloudlib.from_numpy(xyz, intensity=intensity)
        with GLOBAL_TIMER.span("prefilter"):
            ang_vel = self._last_ang_vel if self.cfg.prefilter.deskewing else None
            filtered = self.prefilter(cloud, ang_vel=ang_vel)
        msf_delta, msf_source = None, "imu"
        if self.imu_predictor is not None:
            msf_delta = self.imu_predictor.predict_delta(stamp)
        elif self.cfg.odometry.enable_robot_odometry_init_guess:
            # reference if/else-if order: the IMU frontend wins when enabled
            # (scan_matching_odometry_nodelet.cpp:182-207)
            msf_delta = self._robot_odom_delta(self._prev_frame_time, stamp)
            msf_source = "odometry"
        with GLOBAL_TIMER.span("odometry"):
            odom = np.asarray(
                self.odometry.step(stamp, filtered, msf_delta=msf_delta, msf_source=msf_source),
                dtype=np.float64,
            )
        self._prev_frame_time = stamp
        self.odometry_trajectory.append((stamp, odom))
        self.slam.add_frame(stamp, odom, filtered)
        if self.floor is not None:
            with GLOBAL_TIMER.span("floor_detection"):
                coeffs = self.floor.detect(filtered)
            if coeffs is not None:
                self.slam.add_floor(FloorMeasurement(stamp=stamp, coeffs=coeffs))
        if self._last_optimize_stream_time is None:
            self._last_optimize_stream_time = stamp
        elif stamp - self._last_optimize_stream_time >= self.cfg.backend.graph_update_interval:
            with GLOBAL_TIMER.span("optimize_cycle"):
                self.slam.optimize_cycle()
            self._last_optimize_stream_time = stamp
        return odom

    def add_gps(self, stamp: float, lat: float, lon: float, alt: float = float("nan")) -> None:
        self.slam.add_gps(GpsMeasurement(stamp=stamp, lat=lat, lon=lon, alt=alt))

    def add_imu(self, stamp: float, orientation_wxyz, acceleration, angular_velocity=None) -> None:
        self.slam.add_imu(
            ImuMeasurement(stamp=stamp, orientation=np.asarray(orientation_wxyz), acceleration=np.asarray(acceleration))
        )
        if angular_velocity is not None:
            self._last_ang_vel = np.asarray(angular_velocity, dtype=np.float64)
            if self.imu_predictor is not None:
                self.imu_predictor.add_imu(stamp, angular_velocity, acceleration)

    def add_robot_odometry(self, stamp: float, pose: np.ndarray) -> None:
        """Feed an external wheel/robot odometry pose (4x4, robot_odom frame)
        for the scan-matching init guess (the reference's tf lookup source,
        scan_matching_odometry_nodelet.cpp:193-207)."""
        self._robot_odom.append((float(stamp), np.asarray(pose, dtype=np.float64)))
        # keep a bounded history (a few seconds at sensor rate is plenty)
        if len(self._robot_odom) > 1024:
            del self._robot_odom[: len(self._robot_odom) - 1024]

    def _robot_odom_delta(self, t0: Optional[float], t1: float) -> Optional[np.ndarray]:
        """Delta of the robot-odometry pose between t0 and t1 (nearest
        samples; the reference falls back to the latest tf when the exact
        stamp is unavailable — scan_matching_odometry_nodelet.cpp:196-198).
        None on the first frame or with no samples (identity guess)."""
        if t0 is None or not self._robot_odom:
            return None
        p0 = min(self._robot_odom, key=lambda s: abs(s[0] - t0))[1]
        p1 = min(self._robot_odom, key=lambda s: abs(s[0] - t1))[1]
        return np.linalg.inv(p0) @ p1

    def add_nmea(self, stamp: float, sentence: str) -> None:
        from .io import nmea

        out = nmea.parse(sentence)
        if out.status == "A":
            self.add_gps(stamp, out.latitude, out.longitude)

    def finish(self) -> None:
        """Flush all queues and run a final optimization (config untouched)."""
        self.slam.flush()

    def run(self, frames: Iterable[Tuple[float, np.ndarray, Optional[np.ndarray]]]) -> PipelineResult:
        t0 = time.perf_counter()
        n = 0
        for item in frames:
            stamp, xyz = item[0], item[1]
            intensity = item[2] if len(item) > 2 else None
            self.process_frame(stamp, xyz, intensity)
            n += 1
        self.finish()
        wall = time.perf_counter() - t0
        return PipelineResult(
            trajectory=self.slam.trajectory(),
            odometry_trajectory=self.odometry_trajectory,
            num_frames=n,
            num_keyframes=len(self.slam.keyframes),
            wall_time_s=wall,
            frames_per_second=n / wall if wall > 0 else 0.0,
        )

    def run_windowed(
        self,
        frames: Iterable[Tuple[float, np.ndarray, Optional[np.ndarray]]],
        window: int = 64,
        raw_capacity: Optional[int] = None,
        overlap_backend: bool = False,
    ) -> PipelineResult:
        """Offline throughput mode: prefilter + odometry for ``window``
        frames per device dispatch (frontend/window.py — the reference's
        bag_player.py replay role at device speed), then the backend
        consumes the per-frame results.

        Identical odometry results to run() (same device step, scanned);
        differences: IMU/robot-odometry init guesses are not injected inside
        a window (offline replay rarely has them), and floor detection runs
        only on frames the backend admits as keyframes (floor measurements
        are keyframe-associated anyway, hdl_graph_slam_nodelet.cpp:470-511).
        Deskewing IS threaded (prefiltering_nodelet.cpp:182-243): each frame
        carries the latest IMU angular velocity seen at enqueue time (feed
        them by calling add_imu from the frames generator), same snapshot
        rule as the host path's _last_ang_vel.

        ``overlap_backend=True`` runs each due optimize cycle on a worker
        thread so the frontend's next window dispatches concurrently — the
        reference's timer-decoupled nodelet architecture
        (hdl_graph_slam_nodelet.cpp:137-139) applied to offline replay. The
        HdlGraphSlam locks make this safe; cycle timing relative to window
        boundaries becomes wall-clock dependent, so keep the default
        (synchronous, deterministic) for golden/parity runs.
        """
        from .frontend.window import OdometryWindow, stack_scans

        cap = raw_capacity or self.cloud_capacity * 2
        win = OdometryWindow(
            self.cfg.odometry, prefilter_cfg=self.cfg.prefilter, out_capacity=self.cloud_capacity
        )
        deskew = self.cfg.prefilter.deskewing
        t0 = time.perf_counter()
        n = 0
        state = None
        pending: list = []  # [(stamp, raw xyz, ang_vel or None)]

        def _ang_vels(items):
            out = np.zeros((len(items), 3), dtype=np.float64)
            for i, (_, _, w) in enumerate(items):
                if w is not None:
                    out[i] = w
            return out

        def flush_window():
            nonlocal state, n
            if not pending:
                return
            base = 0
            if state is None:
                # first frame bootstraps the keyframe (:166-174)
                stamp0 = pending[0][0]
                first = cloudlib.from_numpy(pending[0][1], capacity=cap)
                w0 = pending[0][2]
                state = win.init_state(stamp0, first, ang_vel=w0)
                self.odometry_trajectory.append((stamp0, np.eye(4)))
                cloud0 = self.prefilter(first, ang_vel=w0)
                self.slam.add_frame(stamp0, np.eye(4), cloud0)
                if self.floor is not None:
                    coeffs = self.floor.detect(cloud0)
                    if coeffs is not None:
                        self.slam.add_floor(FloorMeasurement(stamp=stamp0, coeffs=coeffs))
                n += 1
                base = 1
                if len(pending) == 1:
                    pending.clear()
                    return
            stamps = np.asarray([s for s, _, _ in pending[base:]], dtype=np.float32)
            xyz, mask = stack_scans([x for _, x, _ in pending[base:]], capacity=cap)
            ang_vels = _ang_vels(pending[base:])
            state, odoms, _status, fxyz, fmask = win.run_with_clouds(
                state, xyz, mask, stamps, ang_vel=ang_vels
            )
            odoms = np.asarray(odoms, dtype=np.float64)
            # feed the backend per frame; keyframe clouds are sliced from the
            # window program's own prefiltered output (device-resident) — no
            # re-prefilter dispatch per admitted keyframe
            for i in range(len(stamps)):
                stamp = float(stamps[i])
                odom = odoms[i]
                self.odometry_trajectory.append((stamp, odom))
                n += 1
                if not self.slam.keyframe_updater.would_update(odom):
                    continue
                cloud = cloudlib.PointCloud(xyz=fxyz[i], mask=fmask[i])
                self.slam.add_frame(stamp, odom, cloud)
                if self.floor is not None:
                    coeffs = self.floor.detect(cloud)
                    if coeffs is not None:
                        self.slam.add_floor(FloorMeasurement(stamp=stamp, coeffs=coeffs))
            pending.clear()

        executor = None
        pending_cycle = None
        if overlap_backend:
            from concurrent.futures import ThreadPoolExecutor

            executor = ThreadPoolExecutor(max_workers=1, thread_name_prefix="backend")

        def run_cycle():
            nonlocal pending_cycle
            if executor is not None:
                if pending_cycle is not None:
                    pending_cycle.result()  # surface worker exceptions
                pending_cycle = executor.submit(self.slam.optimize_cycle)
            else:
                self.slam.optimize_cycle()

        try:
            for item in frames:
                w = self._last_ang_vel if deskew else None
                pending.append((float(item[0]), item[1], w))
                if len(pending) >= window:
                    flush_window()
                    if (
                        self._last_optimize_stream_time is None
                        or item[0] - self._last_optimize_stream_time >= self.cfg.backend.graph_update_interval
                    ):
                        run_cycle()
                        self._last_optimize_stream_time = item[0]
            flush_window()
            if pending_cycle is not None:
                pending_cycle.result()
        finally:
            if executor is not None:
                executor.shutdown(wait=True)
        self.finish()
        wall = time.perf_counter() - t0
        return PipelineResult(
            trajectory=self.slam.trajectory(),
            odometry_trajectory=self.odometry_trajectory,
            num_frames=n,
            num_keyframes=len(self.slam.keyframes),
            wall_time_s=wall,
            frames_per_second=n / wall if wall > 0 else 0.0,
        )


def frames_from_rosbag(path: str, points_topic: str = "/velodyne_points") -> Iterator:
    """Yield (stamp, xyz, intensity) from a bag (bag_player.py replacement)."""
    from .io import rosbag as rb

    reader = rb.BagReader(path)
    for m in reader.messages(topics=[points_topic]):
        stamp, _frame, xyz, inten = rb.parse_pointcloud2(m.raw)
        yield (stamp if stamp > 0 else m.stamp), xyz, inten


def frames_from_kitti(sequence_dir: str) -> Iterator:
    from .io.kitti import KittiOdometrySequence

    for stamp, xyz, refl in KittiOdometrySequence(sequence_dir):
        yield stamp, xyz, refl


class AsyncBackend:
    """Background optimization thread.

    The reference decouples the sensor-rate frontend from the backend with a
    3 s wall timer on the nodelet thread pool (optimization_timer_callback,
    hdl_graph_slam_nodelet.cpp:137-139). This thread reproduces that: it
    wakes every ``interval`` wall seconds and runs one optimize cycle while
    the frontend keeps feeding queues (the HdlGraphSlam locks make this
    safe). Use as a context manager around a real-time run.
    """

    def __init__(self, slam: HdlGraphSlam, interval: Optional[float] = None):
        import threading

        self.slam = slam
        self.interval = interval if interval is not None else slam.cfg.backend.graph_update_interval
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self.cycles = 0
        self.errors: list = []

    def _loop(self):
        while not self._stop.wait(self.interval):
            try:
                with GLOBAL_TIMER.span("async_optimize_cycle"):
                    self.slam.optimize_cycle()
                self.cycles += 1
            except Exception as e:  # surfaced on join; never kills ingestion
                self.errors.append(e)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def stop(self):
        self._stop.set()
        self._thread.join()
        if self.errors:
            raise self.errors[0]
