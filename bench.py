"""Benchmark: scan-matching odometry throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: full GICP frame alignments per second (source covariance
preprocessing + 1-NN correspondences + LM iterations, the per-frame hot
path of SURVEY.md §3.2) on realistic post-prefilter cloud sizes (8192
points, the 0.1 m-voxel indoor regime).

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
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import cloud as cloudlib, se3
    from hdl_graph_slam_tpu.registration import gicp

    n_points = 8192
    rng = np.random.default_rng(0)
    n_half = n_points // 2
    floor = np.stack(
        [rng.uniform(-20, 20, n_half), rng.uniform(-20, 20, n_half), rng.normal(0, 0.02, n_half)], 1
    )
    walls = np.stack(
        [rng.uniform(-20, 20, n_half), rng.normal(15, 0.05, n_half), rng.uniform(0, 4, n_half)], 1
    )
    half = n_half // 2
    walls[half:] = walls[half:][:, [1, 0, 2]]
    pts = np.concatenate([floor, walls]).astype(np.float32)

    xi = jnp.asarray([0.4, -0.2, 0.03, 0.01, 0.02, 0.1], jnp.float32)
    T_true = se3.se3_exp(xi)
    tgt_pts = np.asarray(pts @ np.asarray(T_true)[:3, :3].T + np.asarray(T_true)[:3, 3], np.float32)

    tgt_cloud = cloudlib.from_numpy(tgt_pts, capacity=n_points)
    src_cloud = cloudlib.from_numpy(pts, capacity=n_points)
    guess = jnp.eye(4, dtype=jnp.float32)

    tgt = gicp.preprocess(tgt_cloud)  # amortized per keyframe switch

    def frame_step(src_xyz, src_mask, guess_T):
        """Everything the odometry does per frame on device."""
        src = gicp.preprocess(cloudlib.PointCloud(xyz=src_xyz, mask=src_mask))
        res = gicp.align(tgt, src, guess_T, max_iterations=64)
        return res.transformation, res.converged, res.iterations

    step = jax.jit(frame_step)

    # warmup/compile
    T, conv, iters = step(src_cloud.xyz, src_cloud.mask, guess)
    jax.block_until_ready(T)
    err = np.linalg.inv(np.asarray(T)) @ np.asarray(T_true)
    assert np.linalg.norm(err[:3, 3]) < 0.1, "benchmark alignment failed"

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        T, conv, iters = step(src_cloud.xyz, src_cloud.mask, guess)
    jax.block_until_ready(T)
    dt = (time.perf_counter() - t0) / n_rep

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "scan_match_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (8192-pt GICP align incl. preprocess)",
                "vs_baseline": round(fps / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
