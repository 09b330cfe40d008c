"""End-to-end odometry throughput: per-frame-dispatch variants (the
windowed single-program path lives in /bench.py). Measures what a
LATENCY-BOUND deployment sees per frame — host round-trips included.

Timing note (PERF.md "Measurement discipline"): results are materialized
to host per measurement; through the axon tunnel, per-frame dispatch
latency dominates these variants and varies run to run — that variance is
the finding, not noise (it is why the windowed path is the headline).
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

    from hdl_graph_slam_tpu.core import cloud as cloudlib
    from hdl_graph_slam_tpu.core.config import OdometryConfig, PrefilterConfig, RegistrationConfig
    from hdl_graph_slam_tpu.frontend import DeviceOdometry, Prefilter, ScanMatchingOdometry

    rng = np.random.default_rng(0)

    # synthetic drive through a structured world
    n_world = 60000
    floor = np.stack(
        [rng.uniform(-60, 60, n_world // 2), rng.uniform(-60, 60, n_world // 2), rng.normal(0, 0.02, n_world // 2)], 1
    )
    walls = np.stack(
        [rng.uniform(-60, 60, n_world // 2), rng.normal(25, 0.05, n_world // 2), rng.uniform(0, 5, n_world // 2)], 1
    )
    world = np.concatenate([floor, walls]).astype(np.float32)

    def scan_at(x):
        T = np.eye(4)
        T[0, 3] = x
        local = world - T[:3, 3]
        d = np.linalg.norm(local, axis=1)
        keep = (d > 1.0) & (d < 50.0)
        pts = local[keep]
        idx = rng.choice(pts.shape[0], min(30000, pts.shape[0]), replace=False)
        return pts[idx]

    prefilter = Prefilter(PrefilterConfig(downsample_resolution=0.2, outlier_removal_method="NONE"), out_capacity=16384)
    cfg = OdometryConfig(keyframe_delta_trans=2.0, keyframe_delta_time=1e9, registration=RegistrationConfig())

    n_frames = 40
    scans = [scan_at(0.3 * i) for i in range(n_frames)]

    results = {}
    for name, odo in [("device", DeviceOdometry(cfg)), ("host", ScanMatchingOdometry(cfg))]:
        # warmup (compile)
        for i in range(3):
            c = cloudlib.from_numpy(scans[i], capacity=32768)
            odo.step(i * 0.1, prefilter(c))
        t0 = time.perf_counter()
        out = None
        for i in range(3, n_frames):
            c = cloudlib.from_numpy(scans[i], capacity=32768)
            out = odo.step(i * 0.1, prefilter(c))
        np.asarray(out)  # host materialization — the only reliable fence here
        dt = (time.perf_counter() - t0) / (n_frames - 3)
        results[name] = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "e2e_odometry_fps",
                "value": round(results["device"], 2),
                "unit": "frames/s (30k raw pts -> fused prefilter -> device-resident GICP odometry)",
                "vs_baseline": round(results["device"] / 10.0, 2),
                "host_loop_variant_fps": round(results["host"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
