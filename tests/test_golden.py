"""Golden end-to-end regression: full SLAM on a synthetic loop with known
ground truth; the optimized trajectory must beat raw odometry on ATE and
stay under an absolute bound. This is the quantitative stand-in for the
reference's golden-bag runs (SURVEY.md §4, §6) until the real bags are
available on the machine."""

import numpy as np
import pytest

from hdl_graph_slam_tpu.core import cloud as cloudlib
from hdl_graph_slam_tpu.core.config import SlamConfig, RegistrationConfig
from hdl_graph_slam_tpu.io import trajectory as traj_io
from hdl_graph_slam_tpu.pipeline import SlamPipeline
from tests.test_pipeline import drive_square, make_world, scan_at


@pytest.mark.slow
def test_golden_square_loop_ate(world=None):
    world = make_world(n=10000)
    poses = drive_square(side=4.5, step=1.5, turn_steps=4)  # 28 frames, closes loop

    reg = RegistrationConfig(registration_method="FAST_GICP")
    cfg = SlamConfig()
    cfg.prefilter.downsample_resolution = 0.3
    cfg.prefilter.outlier_removal_method = "NONE"
    cfg.odometry.registration = reg
    cfg.odometry.keyframe_delta_trans = 1.5
    cfg.odometry.keyframe_delta_time = 1e9
    cfg.backend.keyframe_delta_trans = 1.5
    cfg.backend.fix_first_node = True
    cfg.backend.fix_first_node_stddev = "10 10 10 1 1 1"
    cfg.backend.g2o_solver_num_iterations = 40
    cfg.backend.graph_update_interval = 4.0
    cfg.loop.registration = reg
    cfg.loop.distance_thresh = 3.0
    cfg.loop.accum_distance_thresh = 8.0
    cfg.loop.min_edge_interval = 4.0
    cfg.loop.fitness_score_thresh = 0.5
    cfg.floor.enabled = True
    cfg.floor.sensor_height = 1.8
    cfg.floor.floor_pts_thresh = 100

    pipe = SlamPipeline(cfg, cloud_capacity=4096)
    truth = []
    rng = np.random.default_rng(0)
    for i, pose in enumerate(poses):
        sensor = pose.copy()
        sensor[2, 3] += 1.8
        truth.append((float(i), sensor))
        scan = scan_at(world, pose, seed=i, n_keep=3000)
        # inject measurement noise so odometry drifts like real data
        scan = scan + rng.normal(0, 0.005, scan.shape).astype(np.float32)
        pipe.process_frame(float(i), scan)
    pipe.finish()

    est = pipe.slam.trajectory()
    odom = pipe.odometry_trajectory
    ate_opt = traj_io.ate_rmse(est, truth, align=True)
    ate_odom = traj_io.ate_rmse(odom, truth, align=True)

    assert np.isfinite(ate_opt)
    # absolute quality gate on a 24 m loop
    assert ate_opt < 0.2, (ate_opt, ate_odom)
    # the graph must not be (much) worse than raw odometry
    assert ate_opt <= ate_odom * 1.5 + 0.02, (ate_opt, ate_odom)
    # at least one loop edge found
    n_se3_edges = len(pipe.slam.graph.edge_rows["se3_se3"])
    n_kf = len(pipe.slam.keyframes)
    assert n_se3_edges >= n_kf, (n_se3_edges, n_kf)  # odometry chain + anchor + loops
