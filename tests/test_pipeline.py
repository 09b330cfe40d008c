"""End-to-end pipeline tests on a synthetic world: prefilter -> odometry ->
floor detection -> backend graph -> optimize -> map. The closest thing the
reference has is golden-bag runs (SURVEY.md §4); this is the deterministic
synthetic equivalent."""

import jax.numpy as jnp
import numpy as np
import pytest

from hdl_graph_slam_tpu.core import cloud as cloudlib
from hdl_graph_slam_tpu.core import se3
from hdl_graph_slam_tpu.core.config import (
    FloorDetectionConfig,
    OdometryConfig,
    PrefilterConfig,
    RegistrationConfig,
    SlamConfig,
)
from hdl_graph_slam_tpu.frontend import FloorDetector, Prefilter, ScanMatchingOdometry
from hdl_graph_slam_tpu.backend import HdlGraphSlam, FloorMeasurement


def make_world(seed=0, n=12000):
    """A room: floor at z=0, walls, pillars — dense enough to scan-match."""
    rng = np.random.default_rng(seed)
    pts = []
    # floor 30x30
    f = np.stack([rng.uniform(-15, 15, n // 2), rng.uniform(-15, 15, n // 2), rng.normal(0, 0.01, n // 2)], 1)
    pts.append(f)
    # 4 walls
    for k in range(4):
        m = n // 8
        w = np.stack([rng.uniform(-15, 15, m), np.full(m, 15.0) + rng.normal(0, 0.01, m), rng.uniform(0, 4, m)], 1)
        ang = k * np.pi / 2
        R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        pts.append(w @ R.T)
    return np.concatenate(pts).astype(np.float32)


def scan_at(world, pose, sensor_height=1.8, max_range=25.0, n_keep=2500, seed=0):
    """Simulated scan: world points within range of the sensor, expressed in
    the sensor frame."""
    rng = np.random.default_rng(seed)
    sensor = pose.copy()
    sensor[2, 3] += sensor_height
    inv = np.linalg.inv(sensor)
    local = world @ inv[:3, :3].T + inv[:3, 3]
    d = np.linalg.norm(local, axis=1)
    keep = (d > 0.5) & (d < max_range)
    local = local[keep]
    if local.shape[0] > n_keep:
        local = local[rng.choice(local.shape[0], n_keep, replace=False)]
    return local


def drive_square(side=8.0, step=1.0, turn_steps=4):
    """Square trajectory on the floor, yaw following the path; turns are
    spread over several frames like a real 10 Hz scan sequence."""
    poses = []
    T = np.eye(4)
    poses.append(T.copy())
    for leg in range(4):
        for _ in range(int(side / step)):
            d = np.eye(4)
            d[0, 3] = step
            T = T @ d
            poses.append(T.copy())
        for _ in range(turn_steps):
            turn = np.eye(4)
            turn[:3, :3] = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2 / turn_steps])))
            T = T @ turn
            poses.append(T.copy())
    return poses


@pytest.fixture(scope="module")
def world():
    return make_world()


class TestOdometryPipeline:
    def test_odometry_tracks_square(self, world):
        cfg = OdometryConfig(
            keyframe_delta_trans=2.0,
            keyframe_delta_angle=0.8,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(registration_method="FAST_GICP"),
        )
        odo = ScanMatchingOdometry(cfg)
        poses = drive_square(side=4.0, step=1.0, turn_steps=6)[:14]
        errs = []
        for i, pose in enumerate(poses):
            scan = scan_at(world, pose, seed=i)
            cloud = cloudlib.from_numpy(scan, capacity=2560)
            est = odo.step(float(i) * 0.1, cloud)
            # odometry is relative to the first sensor pose
            err = np.linalg.inv(pose) @ est
            errs.append(np.linalg.norm(err[:3, 3]))
        assert max(errs) < 0.25, errs
        assert np.median(errs) < 0.02, errs

    def test_status_populated(self, world):
        odo = ScanMatchingOdometry(OdometryConfig(registration=RegistrationConfig()))
        for i in range(2):
            scan = scan_at(world, np.eye(4), seed=i)
            odo.step(float(i) * 0.1, cloudlib.from_numpy(scan, capacity=2560))
        st = odo.last_status
        assert st is not None and st.has_converged
        assert st.inlier_fraction > 0.8


class TestFloorPipeline:
    def test_detect_floor(self, world):
        det = FloorDetector(FloorDetectionConfig(sensor_height=1.8, floor_pts_thresh=100))
        scan = scan_at(world, np.eye(4))
        coeffs = det.detect(cloudlib.from_numpy(scan, capacity=8192))
        assert coeffs is not None
        np.testing.assert_allclose(coeffs[:3], [0, 0, 1], atol=0.02)
        # floor is sensor_height below the sensor: n.p + d = 0 at p=(0,0,-1.8)
        assert abs(coeffs[3] - 1.8) < 0.1

    def test_no_floor_in_empty_scan(self):
        det = FloorDetector(FloorDetectionConfig(floor_pts_thresh=100))
        rng = np.random.default_rng(1)
        scan = rng.uniform(-5, 5, (50, 3)).astype(np.float32)
        assert det.detect(cloudlib.from_numpy(scan, capacity=256)) is None


@pytest.mark.slow
class TestFullSlam:
    def test_square_loop_slam(self, world):
        """Drive a square; the backend must build a graph, detect the loop
        when returning to start, and keep the map consistent."""
        reg = RegistrationConfig(registration_method="FAST_GICP")
        cfg = SlamConfig()
        cfg.odometry.registration = reg
        cfg.odometry.keyframe_delta_trans = 1.0
        cfg.odometry.keyframe_delta_time = 1e9
        cfg.backend.keyframe_delta_trans = 1.0
        cfg.backend.fix_first_node = True
        cfg.backend.fix_first_node_stddev = "10 10 10 1 1 1"
        cfg.backend.g2o_solver_num_iterations = 30
        cfg.loop.distance_thresh = 3.0
        cfg.loop.accum_distance_thresh = 8.0
        cfg.loop.min_edge_interval = 3.0
        cfg.loop.fitness_score_thresh = 0.5
        cfg.loop.registration = reg

        odo = ScanMatchingOdometry(cfg.odometry)
        slam = HdlGraphSlam(cfg)

        poses = drive_square(side=6.0, step=1.5)
        for i, pose in enumerate(poses):
            scan = scan_at(world, pose, seed=i)
            cloud = cloudlib.from_numpy(scan, capacity=2560)
            est = odo.step(float(i), cloud)
            slam.add_frame(float(i), est, cloud)
            if i % 4 == 3:
                slam.optimize_cycle()
        slam.optimize_cycle()

        assert len(slam.keyframes) >= 8
        # trajectory should return near the start
        traj = slam.trajectory()
        start = traj[0][1][:3, 3]
        end_err = np.linalg.norm(traj[-1][1][:3, 3] - poses[-1][:3, 3])
        assert end_err < 1.0, end_err

        m = slam.generate_map(resolution=0.3)
        assert m is not None and m.shape[0] > 500

    def test_gps_constraints(self):
        """GPS priors anchor the graph in UTM frame."""
        from hdl_graph_slam_tpu.backend import GpsMeasurement

        cfg = SlamConfig()
        cfg.backend.gps_edge_stddev_xy = 1.0
        cfg.backend.keyframe_delta_trans = 0.5  # admit every 1 m frame
        slam = HdlGraphSlam(cfg)
        rng = np.random.default_rng(0)
        cloud = cloudlib.from_numpy(rng.uniform(-5, 5, (500, 3)).astype(np.float32))
        # straight line east, 1 m per frame
        lat0, lon0 = 35.0, 139.0
        for i in range(12):
            T = np.eye(4)
            T[0, 3] = float(i)
            slam.add_frame(float(i), T, cloud)
            # ~1e-5 deg lon ~ 0.9 m at this latitude... use exact meters via
            # small increments: 1 m east ~ 1/ (111320*cos(lat)) deg
            dlon = i * 1.0 / (111320.0 * np.cos(np.radians(lat0)))
            slam.add_gps(GpsMeasurement(stamp=float(i), lat=lat0, lon=lon0 + dlon, alt=10.0))
        slam.cfg.backend.max_keyframes_per_update = 100
        slam.optimize_cycle()
        slam.optimize_cycle()
        assert slam.zero_utm is not None
        # keyframes got utm coords
        n_utm = sum(1 for k in slam.keyframes if k.utm_coord is not None)
        assert n_utm >= len(slam.keyframes) - 2, (n_utm, len(slam.keyframes))
        # and the GPS prior-edge table is populated
        assert len(slam.graph.edge_rows["se3_prior_xyz"]) == n_utm

    def test_floor_constraints_flatten_drift(self, world):
        """Odometry z-drift is corrected by floor edges: the base frame is
        the sensor frame (height 1.8 above the floor), so every optimized
        pose should return to z = 1.8."""
        cfg = SlamConfig()
        cfg.backend.floor_edge_stddev = 0.1
        cfg.backend.max_keyframes_per_update = 100
        slam = HdlGraphSlam(cfg)
        det = FloorDetector(FloorDetectionConfig(sensor_height=1.8, floor_pts_thresh=100))
        n_floor = 0
        for i in range(12):
            ground = np.eye(4)
            ground[0, 3] = float(i) * 2.0
            sensor_true = ground.copy()
            sensor_true[2, 3] = 1.8
            # odometry drifts upward relative to the true sensor pose
            T_drift = sensor_true.copy()
            T_drift[2, 3] += 0.05 * i
            scan = scan_at(world, ground, sensor_height=1.8, seed=100 + i)
            cloud = cloudlib.from_numpy(scan, capacity=2560)
            slam.add_frame(float(i), T_drift, cloud)
            coeffs = det.detect(cloud)
            if coeffs is not None:
                n_floor += 1
                slam.add_floor(FloorMeasurement(stamp=float(i), coeffs=coeffs))
        assert n_floor >= 10  # the detector must find the floor
        slam.optimize_cycle()
        slam.optimize_cycle()
        zs = np.array([slam.graph.poses[k.node_id][2, 3] for k in slam.keyframes])
        drift = np.abs(zs - 1.8)
        assert np.mean(drift) < 0.05, zs


class TestPersistence:
    def test_dump_load_roundtrip(self, world, tmp_path):
        from hdl_graph_slam_tpu.backend import HdlGraphSlam

        cfg = SlamConfig()
        cfg.backend.keyframe_delta_trans = 1.0
        cfg.backend.max_keyframes_per_update = 100
        cfg.backend.fix_first_node = True
        slam = HdlGraphSlam(cfg)
        for i in range(6):
            T = np.eye(4)
            T[0, 3] = float(i) * 1.5
            scan = scan_at(world, T, seed=i)
            slam.add_frame(float(i), T, cloudlib.from_numpy(scan, capacity=2560))
        slam.optimize_cycle()

        d = str(tmp_path / "dump")
        assert slam.dump(d)

        slam2 = HdlGraphSlam(cfg)
        assert slam2.load(d)
        assert len(slam2.keyframes) == len(slam.keyframes)
        for a, b in zip(slam.keyframes, slam2.keyframes):
            np.testing.assert_allclose(
                slam.graph.poses[a.node_id], slam2.graph.poses[b.node_id], atol=1e-6
            )
            assert abs(a.accum_distance - b.accum_distance) < 1e-6
        # graph content survived
        assert slam2.graph.num_edges == slam.graph.num_edges
        # resume: can keep adding frames and optimizing
        T = np.eye(4)
        T[0, 3] = 9.0
        slam2.add_frame(6.0, T, slam.keyframes[0].cloud)
        slam2.optimize_cycle()

    def test_g2o_roundtrip(self, tmp_path):
        from hdl_graph_slam_tpu.graph import GraphBuilder
        from hdl_graph_slam_tpu.graph.io import load_g2o, save_g2o

        g = GraphBuilder()
        T0 = np.eye(4)
        T1 = np.eye(4)
        T1[:3, 3] = [1.0, 0.5, 0.2]
        i0 = g.add_se3_node(T0, fixed=True)
        i1 = g.add_se3_node(T1)
        p0 = g.add_plane_node([0, 0, 1.0, 0.3], fixed=True)
        g.add_se3_edge(i1, i0, np.linalg.inv(T1), np.eye(6) * 5, kernel="Huber", kernel_delta=0.7)
        g.add_se3_plane_edge(i1, p0, [0, 0, 1.0, 0.3], np.eye(3) * 2)
        g.add_se3_prior_xyz_edge(i1, [1.0, 0.5, 0.2], np.eye(3))

        path = str(tmp_path / "g.g2o")
        save_g2o(g, path)
        g2 = load_g2o(path)
        assert len(g2.poses) == 2 and len(g2.planes) == 1
        assert g2.pose_fixed[0] and g2.plane_fixed[0]
        np.testing.assert_allclose(g2.poses[1], T1, atol=1e-6)
        assert g2.num_edges == 3
        row = g2.edge_rows["se3_se3"][0]
        assert row["kernel_id"] != 0 and abs(row["kernel_delta"] - 0.7) < 1e-9
        np.testing.assert_allclose(row["meas"], np.linalg.inv(T1), atol=1e-6)

    def test_save_map(self, world, tmp_path):
        from hdl_graph_slam_tpu.backend import HdlGraphSlam
        from hdl_graph_slam_tpu.io import pcd as pcdio

        cfg = SlamConfig()
        cfg.backend.max_keyframes_per_update = 100
        slam = HdlGraphSlam(cfg)
        for i in range(3):
            T = np.eye(4)
            T[0, 3] = float(i) * 3.0
            scan = scan_at(world, T, seed=i)
            slam.add_frame(float(i), T, cloudlib.from_numpy(scan, capacity=2560))
        slam.optimize_cycle()
        p = str(tmp_path / "map.pcd")
        assert slam.save_map(p, resolution=0.5)
        xyz, _ = pcdio.load_pcd(p)
        assert xyz.shape[0] > 100

    def test_save_map_utm(self, world, tmp_path):
        """SaveMap.srv utm flag parity (hdl_graph_slam_nodelet.cpp:995-999):
        with a zero_utm datum, utm=True shifts every output point by
        zero_utm; the .utm sidecar is written either way."""
        from hdl_graph_slam_tpu.backend import HdlGraphSlam
        from hdl_graph_slam_tpu.io import pcd as pcdio

        cfg = SlamConfig()
        cfg.backend.max_keyframes_per_update = 100
        slam = HdlGraphSlam(cfg)
        for i in range(3):
            T = np.eye(4)
            T[0, 3] = float(i) * 3.0
            scan = scan_at(world, T, seed=i)
            slam.add_frame(float(i), T, cloudlib.from_numpy(scan, capacity=2560))
        slam.optimize_cycle()
        zero_utm = np.array([384000.25, 3874000.5, 150.0])
        slam.zero_utm = zero_utm.copy()

        p_map = str(tmp_path / "map.pcd")
        p_utm = str(tmp_path / "map_utm.pcd")
        assert slam.save_map(p_map, resolution=0.5)
        assert slam.save_map(p_utm, resolution=0.5, utm=True)
        xyz, _ = pcdio.load_pcd(p_map)
        xyz_utm, _ = pcdio.load_pcd(p_utm)
        np.testing.assert_allclose(
            np.sort(xyz_utm, axis=0), np.sort(xyz + zero_utm[None, :].astype(np.float32), axis=0), atol=1.5
        )
        # medians must differ by exactly the datum (robust to float32 rounding)
        np.testing.assert_allclose(np.median(xyz_utm, 0) - np.median(xyz, 0), zero_utm, atol=0.5)
        assert (tmp_path / "map_utm.pcd.utm").read_text().split() == ["384000.250000", "3874000.500000", "150.000000"]
        # no datum -> utm flag is a no-op like the reference's zero_utm guard
        slam.zero_utm = None
        p_plain = str(tmp_path / "map_noutm.pcd")
        assert slam.save_map(p_plain, resolution=0.5, utm=True)
        xyz_plain, _ = pcdio.load_pcd(p_plain)
        np.testing.assert_allclose(np.sort(xyz_plain, 0), np.sort(xyz, 0), atol=1e-5)


@pytest.mark.slow
class TestOfflinePipeline:
    def test_run_synthetic(self, world):
        from hdl_graph_slam_tpu.pipeline import SlamPipeline

        cfg = SlamConfig()
        cfg.prefilter.downsample_resolution = 0.4
        cfg.prefilter.outlier_removal_method = "NONE"
        cfg.odometry.keyframe_delta_trans = 1.0
        cfg.odometry.keyframe_delta_time = 1e9
        cfg.backend.keyframe_delta_trans = 1.0
        cfg.backend.graph_update_interval = 3.0
        cfg.floor.enabled = True
        cfg.floor.sensor_height = 1.8
        cfg.floor.floor_pts_thresh = 50

        pipe = SlamPipeline(cfg, cloud_capacity=8192)
        poses = drive_square(side=4.0, step=1.0)[:10]
        frames = []
        for i, pose in enumerate(poses):
            frames.append((float(i), scan_at(world, pose, seed=i, n_keep=4000), None))
        result = pipe.run(frames)
        assert result.num_frames == 10
        assert result.num_keyframes >= 4
        # odometry should track within tolerance
        est = result.trajectory[-1][1]
        sensor_last = poses[len(poses) - 1].copy()
        sensor_last[2, 3] += 1.8
        sensor_0 = poses[0].copy()
        sensor_0[2, 3] += 1.8
        T_true = np.linalg.inv(sensor_0) @ sensor_last
        # account: trajectory poses are odometry-frame (start at first kf)
        err = np.linalg.norm(est[:3, 3] - T_true[:3, 3])
        assert err < 0.5, (est[:3, 3], T_true[:3, 3])

    def test_finish_leaves_config_untouched(self, world):
        """finish() must drain all queues via HdlGraphSlam.flush() without
        mutating the config (round-1 finish() rewrote
        max_keyframes_per_update, corrupting later cycles)."""
        from hdl_graph_slam_tpu.pipeline import SlamPipeline

        cfg = SlamConfig()
        cfg.prefilter.downsample_resolution = 0.4
        cfg.prefilter.outlier_removal_method = "NONE"
        cfg.odometry.keyframe_delta_trans = 0.5
        cfg.odometry.keyframe_delta_time = 1e9
        cfg.backend.keyframe_delta_trans = 0.5
        cfg.backend.max_keyframes_per_update = 2  # force multiple flush cycles
        cfg.backend.graph_update_interval = 1e9  # no mid-run optimize
        cfg.floor.enabled = False

        pipe = SlamPipeline(cfg, cloud_capacity=8192)
        for i in range(8):
            pose = np.eye(4)
            pose[0, 3] = 0.8 * i
            pipe.process_frame(float(i), scan_at(world, pose, seed=i, n_keep=3000))
        assert len(pipe.slam.keyframe_queue) > 2
        pipe.finish()
        assert pipe.slam.cfg.backend.max_keyframes_per_update == 2
        assert len(pipe.slam.keyframe_queue) == 0
        assert len(pipe.slam.keyframes) >= 6


@pytest.mark.slow
class TestAsyncBackend:
    def test_async_optimize_runs_concurrently(self, world):
        import time as _time

        from hdl_graph_slam_tpu.pipeline import AsyncBackend

        cfg = SlamConfig()
        cfg.backend.keyframe_delta_trans = 0.5
        cfg.backend.max_keyframes_per_update = 100
        slam = HdlGraphSlam(cfg)
        with AsyncBackend(slam, interval=0.05) as bk:
            for i in range(8):
                T = np.eye(4)
                T[0, 3] = float(i)
                scan = scan_at(world, T, seed=i)
                slam.add_frame(float(i), T, cloudlib.from_numpy(scan, capacity=2560))
                _time.sleep(0.03)
        assert bk.cycles >= 1
        assert len(slam.keyframes) >= 6


class TestImuPrediction:
    def test_identity_without_imu(self):
        from hdl_graph_slam_tpu.frontend.imu_prediction import ImuPredictor

        p = ImuPredictor()
        np.testing.assert_allclose(p.predict_delta(0.0), np.eye(4))
        np.testing.assert_allclose(p.predict_delta(0.1), np.eye(4))

    def test_gyro_integration(self):
        from hdl_graph_slam_tpu.frontend.imu_prediction import ImuPredictor

        p = ImuPredictor()
        p.predict_delta(0.0)  # set frame time
        # constant yaw rate 1 rad/s for 0.1 s at 100 Hz, gravity-only accel
        for k in range(1, 11):
            p.add_imu(k * 0.01, [0, 0, 1.0], [0, 0, 9.80665])
        T = p.predict_delta(0.1)
        ang = np.arctan2(T[1, 0], T[0, 0])
        assert abs(ang - 0.1) < 0.015
        assert np.linalg.norm(T[:3, 3]) < 0.01  # gravity compensated


class TestDeviceOdometry:
    def test_matches_host_odometry(self, world):
        from hdl_graph_slam_tpu.frontend import DeviceOdometry

        cfg = OdometryConfig(
            keyframe_delta_trans=2.0,
            keyframe_delta_angle=0.8,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(registration_method="FAST_GICP"),
        )
        host = ScanMatchingOdometry(cfg)
        dev = DeviceOdometry(cfg)
        poses = drive_square(side=4.0, step=1.0, turn_steps=6)[:10]
        for i, pose in enumerate(poses):
            scan = scan_at(world, pose, seed=i)
            cloud = cloudlib.from_numpy(scan, capacity=2560)
            h = host.step(float(i) * 0.1, cloud)
            d = np.asarray(dev.step(float(i) * 0.1, cloud))
            np.testing.assert_allclose(d, h, atol=5e-3)


class TestOdometryMethods:
    """Method coverage: every registration method drives the odometry."""

    def _run(self, world, method, resolution=1.0, n=5, tol=0.08):
        cfg = OdometryConfig(
            keyframe_delta_trans=3.0,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(registration_method=method, reg_resolution=resolution),
        )
        odo = ScanMatchingOdometry(cfg)
        errs = []
        for i in range(n):
            pose = np.eye(4)
            pose[0, 3] = 0.4 * i
            scan = scan_at(world, pose, seed=i)
            est = odo.step(float(i) * 0.1, cloudlib.from_numpy(scan, capacity=2560))
            errs.append(abs(est[0, 3] - pose[0, 3]))
        assert max(errs) < tol, (method, errs)

    def test_ndt_odometry(self, world):
        self._run(world, "NDT_OMP", resolution=2.0, tol=0.2)

    def test_vgicp_odometry(self, world):
        self._run(world, "FAST_VGICP", resolution=1.0, tol=0.15)

    def test_icp_odometry(self, world):
        self._run(world, "ICP", tol=0.15)


class TestDeviceOdometrySwitching:
    def test_keyframe_switch_flag(self, world):
        from hdl_graph_slam_tpu.frontend import DeviceOdometry

        cfg = OdometryConfig(keyframe_delta_trans=1.5, keyframe_delta_time=1e9,
                             registration=RegistrationConfig())
        odo = DeviceOdometry(cfg)
        switches = []
        for i in range(5):
            pose = np.eye(4)
            pose[0, 3] = 0.8 * i
            scan = scan_at(world, pose, seed=i)
            odo.step(float(i), cloudlib.from_numpy(scan, capacity=2560))
            if odo.last_status is not None:
                switches.append(bool(odo.last_status["keyframe_switched"]))
        # moving 0.8 m/frame with a 1.5 m gate: a switch must occur by frame 2+
        assert any(switches), switches
        # and the pose keeps tracking after the switch
        final = np.asarray(odo.step(5.0, cloudlib.from_numpy(scan_at(world, np.diag([1.0]*4) , seed=9), capacity=2560)))
        assert np.isfinite(final).all()


class TestRobotOdometryInitGuess:
    def test_external_odometry_seeds_scan_matching(self, world):
        """enable_robot_odometry_init_guess: the delta between external poses
        at consecutive frame times seeds the matcher and is labeled
        "odometry" in the status (scan_matching_odometry_nodelet.cpp:193-207)."""
        from hdl_graph_slam_tpu.pipeline import SlamPipeline

        cfg = SlamConfig()
        cfg.prefilter.downsample_resolution = 0.4
        cfg.prefilter.outlier_removal_method = "NONE"
        cfg.odometry.keyframe_delta_trans = 3.0
        cfg.odometry.keyframe_delta_time = 1e9
        cfg.odometry.enable_robot_odometry_init_guess = True
        cfg.backend.graph_update_interval = 1e9
        cfg.floor.enabled = False

        pipe = SlamPipeline(cfg, cloud_capacity=4096)
        for i in range(4):
            pose = np.eye(4)
            pose[0, 3] = 0.5 * i
            # wheel odometry: exact poses (a perfect external source)
            pipe.add_robot_odometry(float(i), pose)
            pipe.process_frame(float(i), scan_at(world, pose, seed=i, n_keep=3000))

        st = pipe.odometry.last_status
        assert st.prediction_labels == ("odometry",)
        # perfect guess: prediction error = T_final^-1 * delta with the
        # delta ~= per-frame step; just require it finite and well-formed
        assert st.prediction_errors[0].shape == (4, 4)
        assert np.all(np.isfinite(st.prediction_errors[0]))
        # and odometry tracked the drive
        est = pipe.odometry_trajectory[-1][1]
        assert abs(est[0, 3] - 1.5) < 0.1


@pytest.mark.slow
class TestWindowedPipeline:
    def test_run_windowed_matches_run(self, world):
        """Offline throughput mode (run_windowed — the bag_player replay role
        at device speed) must produce the same trajectory as the per-frame
        run() within float tolerance."""
        from hdl_graph_slam_tpu.pipeline import SlamPipeline

        def mk():
            cfg = SlamConfig()
            cfg.prefilter.downsample_resolution = 0.4
            cfg.prefilter.outlier_removal_method = "NONE"
            cfg.odometry.keyframe_delta_trans = 1.0
            cfg.odometry.keyframe_delta_time = 1e9
            cfg.backend.keyframe_delta_trans = 1.0
            cfg.backend.graph_update_interval = 3.0
            cfg.floor.enabled = True
            cfg.floor.sensor_height = 1.8
            cfg.floor.floor_pts_thresh = 50
            return cfg

        poses = drive_square(side=4.0, step=1.0)[:9]
        frames = [(float(i), scan_at(world, p, seed=i, n_keep=3000), None) for i, p in enumerate(poses)]

        r_seq = SlamPipeline(mk(), cloud_capacity=4096, device_odometry=True).run(list(frames))
        r_win = SlamPipeline(mk(), cloud_capacity=4096).run_windowed(list(frames), window=4)

        assert r_win.num_frames == r_seq.num_frames == 9
        assert r_win.num_keyframes == r_seq.num_keyframes
        for (s1, T1), (s2, T2) in zip(r_seq.trajectory, r_win.trajectory):
            assert s1 == s2
            np.testing.assert_allclose(T1, T2, atol=2e-3)
        for (s1, T1), (s2, T2) in zip(r_seq.odometry_trajectory, r_win.odometry_trajectory):
            np.testing.assert_allclose(T1, T2, atol=1e-4)

    def test_run_windowed_overlap_backend(self, world):
        """overlap_backend=True (backend cycles on a worker thread, the
        timer-decoupled nodelet architecture in offline replay) must produce
        the same odometry and an equivalent final graph: the odometry window
        never depends on backend output, and flush() settles the graph."""
        from hdl_graph_slam_tpu.pipeline import SlamPipeline

        def mk():
            cfg = SlamConfig()
            cfg.prefilter.downsample_resolution = 0.4
            cfg.prefilter.outlier_removal_method = "NONE"
            cfg.odometry.keyframe_delta_trans = 1.0
            cfg.odometry.keyframe_delta_time = 1e9
            cfg.backend.keyframe_delta_trans = 1.0
            cfg.backend.graph_update_interval = 3.0
            return cfg

        poses = drive_square(side=4.0, step=1.0)[:9]
        frames = [(float(i), scan_at(world, p, seed=i, n_keep=3000), None) for i, p in enumerate(poses)]

        r_sync = SlamPipeline(mk(), cloud_capacity=4096).run_windowed(list(frames), window=4)
        r_ovl = SlamPipeline(mk(), cloud_capacity=4096).run_windowed(
            list(frames), window=4, overlap_backend=True
        )
        assert r_ovl.num_frames == r_sync.num_frames == 9
        assert r_ovl.num_keyframes == r_sync.num_keyframes
        for (s1, T1), (s2, T2) in zip(r_sync.odometry_trajectory, r_ovl.odometry_trajectory):
            np.testing.assert_allclose(T1, T2, atol=1e-6)
        # final optimized trajectories agree after the settling flush
        for (s1, T1), (s2, T2) in zip(r_sync.trajectory, r_ovl.trajectory):
            assert s1 == s2
            np.testing.assert_allclose(T1, T2, atol=1e-2)


class TestImuPreset:
    """launch/hdl_graph_slam_imu.launch analog: IMU-deskewed NDT odometry
    with the EKF init-guess frontend + GICP loop matching."""

    def test_preset_values(self):
        from hdl_graph_slam_tpu.core.config import PRESETS

        cfg = PRESETS["imu"]()
        assert cfg.prefilter.deskewing and cfg.prefilter.scan_period == 0.1
        assert cfg.odometry.enable_imu_frontend
        assert cfg.odometry.registration.registration_method == "NDT_OMP"
        assert cfg.odometry.registration.reg_resolution == 10.0
        assert cfg.loop.registration.registration_method == "GICP"
        assert cfg.backend.graph_update_interval == 1.5
        assert cfg.backend.gps_edge_stddev_xy == 20.0

    def test_runs_with_imu(self):
        from hdl_graph_slam_tpu.core.config import PRESETS
        from hdl_graph_slam_tpu.pipeline import SlamPipeline

        cfg = PRESETS["imu"]()
        cfg.floor.enabled = False
        pipe = SlamPipeline(cfg, cloud_capacity=4096)
        world = make_world(n=8000)
        poses = drive_square(side=4.0, step=1.0)[:3]
        for i, p in enumerate(poses):
            pipe.add_imu(float(i) - 0.05, orientation_wxyz=(1.0, 0, 0, 0),
                         acceleration=(0.0, 0.0, 9.81), angular_velocity=(0.0, 0.0, 0.0))
            pipe.process_frame(float(i), scan_at(world, p, seed=i, n_keep=2500))
        pipe.finish()
        assert len(pipe.odometry_trajectory) == 3


def test_add_frame_projects_rotation_onto_so3():
    """A non-orthogonal odometry rotation (e.g. produced upstream by
    low-precision matmuls) must be polar-projected before it becomes a
    graph measurement: SE(3) residuals on det!=1 rotations report phantom
    chi2 and the optimizer bends the trajectory to 'fix' it (round-4
    post-mortem in PERF.md)."""
    import numpy as np

    from hdl_graph_slam_tpu.backend import HdlGraphSlam
    from hdl_graph_slam_tpu.core import cloud as cloudlib
    from hdl_graph_slam_tpu.core.config import SlamConfig

    slam = HdlGraphSlam(SlamConfig())
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    odom = np.eye(4)
    th = np.radians(3.0)
    c, s = np.cos(th), np.sin(th)
    odom[:3, :3] = 1.05 * np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])  # det 1.16
    assert slam.add_frame(0.0, odom, cloudlib.from_numpy(pts, capacity=256))
    kf = slam.keyframe_queue[-1]
    R = kf.odom[:3, :3]
    assert abs(np.linalg.det(R) - 1.0) < 1e-9
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    # the projection of a scaled rotation is the rotation itself
    np.testing.assert_allclose(R, odom[:3, :3] / 1.05, atol=1e-9)
