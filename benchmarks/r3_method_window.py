"""Windowed device-resident odometry fps per registration method.

bench.py's headline is the GICP window; this measures the same 256-frame
single-program pipeline with VGICP, NDT (DIRECT7) and ICP so every
reference method has a recorded end-to-end TPU number. Same world/drive and
timing discipline as bench.py (host-materialized results, distinct-input
warmup).
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
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import cloud as cloudlib
    from hdl_graph_slam_tpu.core.config import OdometryConfig, PrefilterConfig, RegistrationConfig
    from hdl_graph_slam_tpu.frontend.window import OdometryWindow, stack_scans

    from bench import BENCH_FRAMES, BENCH_RAW_CAPACITY, BENCH_STEP, make_course

    step = BENCH_STEP
    n_frames = BENCH_FRAMES
    raw_capacity = BENCH_RAW_CAPACITY
    scans = make_course(n_frames, step)
    xyz_np, mask_np = stack_scans(scans[1:], capacity=raw_capacity)
    stamps_np = (0.1 * np.arange(1, n_frames + 1)).astype(np.float32)

    ndt = RegistrationConfig(registration_method="NDT_OMP", reg_resolution=2.0,
                             reg_nn_search_method="DIRECT7", reg_reassoc_displacement=0.5)
    # (reg, constant_velocity_guess) — NDT_CV measures the round-4 opt-in
    # warm start (OdometryConfig.constant_velocity_guess), the VERDICT r3
    # next #4 lever for the NDT windowed gap.
    methods = {
        "VGICP": (RegistrationConfig(registration_method="FAST_VGICP", reg_resolution=1.0), False),
        "NDT": (ndt, False),
        "NDT_CV": (ndt, True),
        "ICP": (RegistrationConfig(registration_method="ICP"), False),
    }
    for name, (reg, cv) in methods.items():
        win = OdometryWindow(
            OdometryConfig(keyframe_delta_trans=2.0, keyframe_delta_time=1e9, registration=reg,
                           constant_velocity_guess=cv),
            prefilter_cfg=PrefilterConfig(downsample_resolution=0.2, outlier_removal_method="NONE"),
            out_capacity=8192,
        )
        xyz = jax.device_put(xyz_np)
        mask = jax.device_put(mask_np)
        stamps = jax.device_put(stamps_np)
        state0 = win.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=raw_capacity))
        state0 = jax.block_until_ready(state0)
        t_c = time.perf_counter()
        warm = win.run(state0, jnp.flip(xyz, 0), jnp.flip(mask, 0), stamps)
        np.asarray(warm[1])
        compile_s = time.perf_counter() - t_c

        t0 = time.perf_counter()
        state, odoms, status = win.run(state0, xyz, mask, stamps)
        odoms = np.asarray(odoms)
        conv = float(np.mean(np.asarray(status["converged"])))
        dt = time.perf_counter() - t0
        final_x = float(odoms[-1][0, 3])
        # rotation integrity (round-5, same guard as bench.py): the drift
        # gate can't see a rotation chain leaving SO(3)
        Rs = odoms[:, :3, :3]
        det_err = float(np.abs(np.linalg.det(Rs) - 1.0).max())
        orth_err = float(np.abs(Rs @ np.swapaxes(Rs, 1, 2) - np.eye(3)).max())
        assert det_err < 1e-4 and orth_err < 1e-4, (name, det_err, orth_err)
        print(json.dumps({
            "metric": f"windowed_odometry_{name.lower()}_fps",
            "value": round(n_frames / dt, 1),
            "ms_per_frame": round(dt / n_frames * 1e3, 2),
            "converged_frac": round(conv, 3),
            "final_x_err_m": round(abs(final_x - step * n_frames), 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
