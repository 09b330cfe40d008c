"""Benchmark: end-to-end scan-matching odometry throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the complete per-frame pipeline a deployment runs: 30k-point raw
scan ingestion -> fused prefilter program (distance band + 0.2 m voxel
grid) -> device-resident GICP odometry (covariance preprocessing, exact
brute-force correspondences, LM, convergence gates and keyframe switching
all on chip — one dispatch per frame, frontend/odometry_device.py).

Baseline: the reference's real-time contract is sensor-rate 10 Hz odometry
on CPU (launch/hdl_graph_slam.launch, README.md:6); BASELINE.md sets the
target at >=5x reference frames/s per chip. vs_baseline = fps / 10.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_enable_x64", True)  # voxel int64 keys
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hdl_graph_slam_tpu.core import cloud as cloudlib
    from hdl_graph_slam_tpu.core.config import OdometryConfig, PrefilterConfig, RegistrationConfig
    from hdl_graph_slam_tpu.frontend import DeviceOdometry, Prefilter

    rng = np.random.default_rng(0)

    # structured synthetic world (floor + wall) driven through at 3 m/s
    n_world = 60000
    floor = np.stack(
        [rng.uniform(-60, 60, n_world // 2), rng.uniform(-60, 60, n_world // 2), rng.normal(0, 0.02, n_world // 2)], 1
    )
    walls = np.stack(
        [rng.uniform(-60, 60, n_world // 2), rng.normal(25, 0.05, n_world // 2), rng.uniform(0, 5, n_world // 2)], 1
    )
    # two perpendicular walls so every translation direction is constrained
    half = n_world // 4
    walls[half:] = walls[half:][:, [1, 0, 2]]
    world = np.concatenate([floor, walls]).astype(np.float32)

    def scan_at(x):
        local = world - np.array([x, 0.0, 0.0], dtype=np.float32)
        d = np.linalg.norm(local, axis=1)
        keep = (d > 1.0) & (d < 50.0)
        pts = local[keep]
        idx = rng.choice(pts.shape[0], min(15000, pts.shape[0]), replace=False)
        return pts[idx]

    prefilter = Prefilter(
        PrefilterConfig(downsample_resolution=0.2, outlier_removal_method="NONE"), out_capacity=8192
    )
    odo = DeviceOdometry(
        OdometryConfig(keyframe_delta_trans=2.0, keyframe_delta_time=1e9, registration=RegistrationConfig())
    )

    n_frames = 40
    scans = [scan_at(0.3 * i) for i in range(n_frames)]

    # warmup / compile
    out = None
    for i in range(3):
        c = cloudlib.from_numpy(scans[i], capacity=16384)
        out = odo.step(i * 0.1, prefilter(c))
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(3, n_frames):
        c = cloudlib.from_numpy(scans[i], capacity=16384)
        out = odo.step(i * 0.1, prefilter(c))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (n_frames - 3)

    # sanity: odometry must have tracked the drive
    final = np.asarray(out)
    assert abs(final[0, 3] - 0.3 * (n_frames - 1)) < 0.3, final

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "e2e_odometry_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (15k raw pts -> fused prefilter -> device-resident GICP odometry)",
                "vs_baseline": round(fps / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
