"""Prove the rotation-integrity bench guards catch bf16 pose corruption.

VERDICT r4 next #3 asks for more than assertions in the benches — it asks
for evidence that a DELIBERATELY-DEGRADED run fails them. This probe runs
the same windowed odometry as bench.py on a short course WITH TURNS
(3 deg/frame — cos(3 deg)=0.9986 rounds at bf16's 2^-8 ulp, the exact
mechanism of the round-4 post-mortem) twice on TPU:

1. production code: the guards must PASS (det/orthogonality < 1e-4);
2. pose pins stripped (se3.compose / transform_points / einsums
   monkeypatched to Precision.DEFAULT = bf16 on the MXU): the guards must
   FAIL — det(R) drifts ~0.3%/turn-frame, far past the 1e-4 gate.

Prints one JSON line with both measured drifts.
"""

from __future__ import annotations

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np

N_FRAMES = 48
GUARD = 1e-4  # the bench.py / r3_method_window.py gate


def make_turning_course(n_frames: int):
    """A drive that turns 3 deg/frame through the lidar_sim town."""
    from hdl_graph_slam_tpu.utils import lidar_sim as L

    town = L.make_town(seed=1, blocks=3)
    model = L.LidarModel(rings=32, azimuth_steps=512, max_range=60.0,
                         range_noise=0.02, dropout=0.05)
    scans = []
    pos = np.array([-5.0, -5.0, 1.8])
    heading = 0.0
    step = 0.08
    for i in range(n_frames + 1):
        c, s = np.cos(heading), np.sin(heading)
        T = np.eye(4)
        T[:3, :3] = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        T[:3, 3] = pos
        scans.append(L.scan(town, T, model, seed=i))
        pos = pos + step * np.array([c, s, 0.0])
        heading += np.deg2rad(3.0)
    return scans


def run_window(scans):
    import jax
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import cloud as cloudlib
    from hdl_graph_slam_tpu.core.config import OdometryConfig, PrefilterConfig, RegistrationConfig
    from hdl_graph_slam_tpu.frontend.window import OdometryWindow, stack_scans

    win = OdometryWindow(
        OdometryConfig(keyframe_delta_trans=2.0, keyframe_delta_time=1e9,
                       registration=RegistrationConfig(reg_reassoc_displacement=0.1)),
        prefilter_cfg=PrefilterConfig(downsample_resolution=0.2, outlier_removal_method="NONE"),
        out_capacity=8192,
    )
    xyz_np, mask_np = stack_scans(scans[1:], capacity=16384)
    stamps = jnp.asarray(0.1 * np.arange(1, len(scans)), jnp.float32)
    state0 = win.init_state(0.0, cloudlib.from_numpy(scans[0], capacity=16384))
    _, odoms, _ = win.run(state0, jax.device_put(xyz_np), jax.device_put(mask_np), stamps)
    odoms = np.asarray(odoms)
    Rs = odoms[:, :3, :3]
    det_err = float(np.abs(np.linalg.det(Rs) - 1.0).max())
    orth_err = float(np.abs(Rs @ np.swapaxes(Rs, 1, 2) - np.eye(3)).max())
    return det_err, orth_err


def strip_pose_pins():
    """Monkeypatch the pose-manifold ops back to Precision.DEFAULT (bf16 on
    the MXU) — reproducing the rounds-1-3 numerics the guards must catch."""
    import jax
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import se3

    se3._HIGHEST = jax.lax.Precision.DEFAULT
    se3._mm = lambda a, b: jnp.matmul(a, b)
    se3.compose = lambda A, B: jnp.matmul(A, B)

    def transform_points(T, pts):
        R = T[..., :3, :3]
        t = T[..., :3, 3]
        return jnp.matmul(pts, jnp.swapaxes(R, -1, -2)) + t[..., None, :]

    se3.transform_points = transform_points

    def inverse(T):
        R = T[..., :3, :3]
        t = T[..., :3, 3]
        Rt = jnp.swapaxes(R, -1, -2)
        ti = -jnp.einsum("...ij,...j->...i", Rt, t)
        out = jnp.zeros_like(T)
        out = out.at[..., :3, :3].set(Rt)
        out = out.at[..., :3, 3].set(ti)
        out = out.at[..., 3, 3].set(1.0)
        return out

    se3.inverse = inverse


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    scans = make_turning_course(N_FRAMES)

    det_good, orth_good = run_window(scans)
    assert det_good < GUARD and orth_good < GUARD, (
        f"production run FAILED the guard: det {det_good:.2e} orth {orth_good:.2e}")

    strip_pose_pins()
    det_bad, orth_bad = run_window(scans)
    degraded_fails = det_bad >= GUARD or orth_bad >= GUARD

    print(json.dumps({
        "metric": "rotation_guard_validation",
        "value": 1 if degraded_fails else 0,
        "unit": "1 = degraded (bf16 pose products) run trips the det/orth guard",
        "production_det_err": det_good,
        "production_orth_err": orth_good,
        "degraded_det_err": det_bad,
        "degraded_orth_err": orth_bad,
        "guard": GUARD,
        "frames": N_FRAMES,
        "vs_baseline": None,
    }), flush=True)
    assert degraded_fails, "bf16-degraded run did NOT trip the guard"


if __name__ == "__main__":
    main()
