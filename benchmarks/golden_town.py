"""Long multi-loop golden course on ray-cast LiDAR (TPU).

The full-scale version of tests/test_golden.py::test_golden_town_multiloop:
TWO laps around a city-block perimeter (~600 frames at 1.2 m/frame, 3 deg/
frame corner arcs — KITTI-like motion), scans ray-cast with first-hit
occlusion from utils/lidar_sim.py, the COMPLETE pipeline doing the work:
prefilter + scan-matching odometry (no injected drift — real accumulated
error) + keyframe admission + batched loop-candidate matching + robustified
LM graph optimization. Second-lap corner revisits see building facades with
partial (occluded) overlap — the regime the reference validates with golden
bags (/root/reference/README.md Example sections).

Prints one JSON line per mode with ATE RMSE / loop count / throughput;
PERF.md records the numbers (VERDICT r2 next #1 "a recorded ATE on the
long course in PERF.md").
"""

from __future__ import annotations

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hdl_graph_slam_tpu.core.config import RegistrationConfig, SlamConfig
    from hdl_graph_slam_tpu.io import trajectory as traj_io
    from hdl_graph_slam_tpu.pipeline import SlamPipeline
    from hdl_graph_slam_tpu.utils import lidar_sim as L

    town = L.make_town(seed=1, blocks=3)
    model = L.LidarModel(rings=32, azimuth_steps=512, max_range=60.0, range_noise=0.02, dropout=0.05)
    poses = L.town_course(blocks=2, loops=2, step=1.2)

    t0 = time.perf_counter()
    frames = []
    truth = []
    for i, pose in enumerate(poses):
        sensor = pose.copy()
        sensor[2, 3] += 1.8
        truth.append((float(i), sensor))
        frames.append((float(i), L.scan(town, sensor, model, seed=i), None))
    sim_dt = time.perf_counter() - t0

    import sys

    modes = ["base"]
    for a in sys.argv[1:]:
        if a.startswith("--modes="):
            modes = a.split("=", 1)[1].split(",")

    def make_cfg(mode: str) -> SlamConfig:
        reg = RegistrationConfig(registration_method="FAST_GICP", reg_reassoc_displacement=0.1)
        cfg = SlamConfig()
        cfg.prefilter.downsample_resolution = 0.5
        cfg.prefilter.outlier_removal_method = "NONE"
        cfg.prefilter.distance_far_thresh = 60.0
        cfg.odometry.registration = reg
        cfg.odometry.keyframe_delta_trans = 4.0
        cfg.odometry.keyframe_delta_time = 1e9
        cfg.backend.keyframe_delta_trans = 4.0
        cfg.backend.fix_first_node = True
        cfg.backend.fix_first_node_stddev = "10 10 1000 1 1 1"
        cfg.backend.g2o_solver_num_iterations = 60
        cfg.backend.graph_update_interval = 10.0
        # loop gates: the reference's own outdoor tuning
        # (launch/hdl_graph_slam_400.launch:105-108 — distance_thresh 15, accum 25,
        # min_edge_interval 15, fitness 2.5; hdl_graph_slam.launch goes to 20 m).
        # The first golden_town run used distance_thresh=8.0 and detected ZERO
        # loops over two laps: odometry drift at the lap-2 revisit exceeds 8 m of
        # estimated separation, so every candidate was gated out before matching.
        # The estimated-distance gate must be sized ABOVE the expected drift —
        # exactly why the reference ships 15-20 m for outdoor courses.
        cfg.loop.registration = reg
        cfg.loop.distance_thresh = 15.0
        cfg.loop.accum_distance_thresh = 25.0
        cfg.loop.min_edge_interval = 15.0
        cfg.loop.fitness_score_thresh = 2.5
        cfg.floor.enabled = False
        if mode == "floor":
            # BASELINE config #2 analog: floor-plane constraint active
            # (launch default floor_edge_stddev 10.0); the town ground is a
            # real z=0 plane with buildings above it
            cfg.floor.enabled = True
            cfg.floor.sensor_height = 1.8
            cfg.floor.height_clip_range = 1.0
            cfg.floor.floor_pts_thresh = 256
        elif mode == "gps":
            # BASELINE config #4 analog: GPS position priors at ~1.5 m noise
            # with the reference's own outdoor weighting
            # (hdl_graph_slam_400.launch gps_edge_stddev_xy=20): deliberately
            # WEAK so GPS pins the global frame without locally bending the
            # cm-consistent odometry+loop trajectory. A first run used
            # stddev 2.0 ("noise-matched") and measured ATE 1.64 — the
            # optimizer simply followed the noisy fixes; the reference's 10x
            # under-weighting is the operationally correct choice and the
            # recorded row uses it.
            cfg.backend.enable_gps = True
            cfg.backend.gps_edge_stddev_xy = 20.0
            cfg.backend.gps_edge_stddev_z = 5.0
        return cfg

    # GPS fixes: invert the UTM projection's local Jacobian so easting/
    # northing land exactly at truth xy + noise (same technique as
    # tests/test_golden.py::test_golden_gps_imu_course)
    from hdl_graph_slam_tpu.io.geodesy import wgs84_to_utm

    lat0, lon0 = 35.0, 139.0
    e0, n0_, _ = wgs84_to_utm(lat0, lon0)
    h = 1e-6
    e_lat, n_lat, _ = wgs84_to_utm(lat0 + h, lon0)
    e_lon, n_lon, _ = wgs84_to_utm(lat0, lon0 + h)
    J = np.array([[(e_lat - e0) / h, (e_lon - e0) / h], [(n_lat - n0_) / h, (n_lon - n0_) / h]])
    Jinv = np.linalg.inv(J)
    gps_rng = np.random.default_rng(7)
    gps_noise = gps_rng.normal(0.0, 1.5, (len(frames), 2))
    # first fix noiseless: it becomes the zero_utm datum, and the unaligned
    # ATE below anchors truth at truth[0] — noise there would add a constant
    # offset to every error term
    gps_noise[0] = 0.0

    def run_once(cfg, with_gps: bool):
        pipe = SlamPipeline(cfg, cloud_capacity=4096)

        def feed():
            for i, item in enumerate(frames):
                if with_gps:
                    dlat, dlon = Jinv @ (truth[i][1][:2, 3] + gps_noise[i])
                    pipe.add_gps(item[0], lat0 + dlat, lon0 + dlon, alt=10.0)
                yield item

        t0 = time.perf_counter()
        # raw_capacity must hold the full 32x512-beam scans (10-12k pts):
        # the default (2*cloud_capacity = 8192) would subsample them, and
        # before the r4 strided-subsample fix it TRUNCATED them ring-major,
        # leaving ~99% ground points and no horizontal constraint at all
        # (the round-3 ATE=23.8 m "never executed" result).
        pipe.run_windowed(feed(), window=16, raw_capacity=16384)
        dt = time.perf_counter() - t0
        return pipe, dt

    for mode in modes:
        report_mode(mode, make_cfg(mode), run_once, frames, truth, poses, sim_dt)


def report_mode(mode, cfg, run_once, frames, truth, poses, sim_dt):
    from hdl_graph_slam_tpu.io import trajectory as traj_io

    with_gps = mode == "gps"
    # warm pass compiles every program (graph capacity buckets included)
    _, cold_dt = run_once(cfg, with_gps)
    pipe, dt = run_once(cfg, with_gps)

    # rotation integrity (round-5): THIS course has in-place corner turns —
    # exactly where the bf16 MXU default inflated det(R) to 1.1-1.4 through
    # rounds 1-3 (PERF.md round-4 post-mortem). Guard every odometry pose.
    Rs = np.stack([np.asarray(T)[:3, :3] for _, T in pipe.odometry_trajectory])
    det_err = float(np.abs(np.linalg.det(Rs) - 1.0).max())
    orth_err = float(np.abs(Rs @ np.swapaxes(Rs, 1, 2) - np.eye(3)).max())
    assert det_err < 1e-4 and orth_err < 1e-4, (det_err, orth_err)

    est = pipe.slam.trajectory()
    kf_stamps = {s for s, _ in est}
    odom_kf = [(s, T) for s, T in pipe.odometry_trajectory if s in kf_stamps]
    ate_opt = traj_io.ate_rmse(est, truth, align=True)
    ate_odom = traj_io.ate_rmse(odom_kf, truth, align=True)
    n_kf = len(pipe.slam.keyframes)
    n_loops = len(pipe.slam.graph.edge_rows["se3_se3"]) - (n_kf - 1) - 1  # chain+anchor

    # course length for context (m)
    length = sum(
        float(np.linalg.norm(poses[i + 1][:3, 3] - poses[i][:3, 3])) for i in range(len(poses) - 1)
    )
    suffix = "" if mode == "base" else f"_{mode}"
    out = {
        "metric": f"golden_town_ate_rmse{suffix}",
        "value": round(float(ate_opt), 4),
        "unit": "m ATE RMSE (optimized, Umeyama-aligned), 2-lap occluded town course"
        + {"base": "", "floor": " + floor-plane edges", "gps": " + GPS priors (1.5 m noise)"}[mode],
        "ate_odom_m": round(float(ate_odom), 4),
        "frames": len(frames),
        "course_length_m": round(length, 1),
        "keyframes": n_kf,
        "loop_edges": n_loops,
        "fps": round(len(frames) / dt, 2),
        "cold_wall_s": round(cold_dt, 1),
        "sim_wall_s": round(sim_dt, 1),
        "vs_baseline": None,
    }
    if mode == "floor":
        out["floor_edges"] = len(pipe.slam.graph.edge_rows["se3_plane"])
    if mode == "gps":
        out["gps_edges"] = len(pipe.slam.graph.edge_rows["se3_prior_xy"]) + len(
            pipe.slam.graph.edge_rows["se3_prior_xyz"])
        # GPS pins the absolute frame: also report the unaligned ATE in the
        # first-fix-anchored frame (Umeyama would absorb the very offset GPS
        # is supposed to fix)
        datum = truth[0][1][:3, 3]
        truth_anchored = []
        for s, T in truth:
            Ta = T.copy()
            Ta[:3, 3] = Ta[:3, 3] - datum
            truth_anchored.append((s, Ta))
        out["ate_unaligned_m"] = round(float(traj_io.ate_rmse(
            pipe.slam.trajectory(), truth_anchored, align=False)), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
