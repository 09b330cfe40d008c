"""GICP/VGICP with displacement-gated correspondence carry, on the chip.

Cold (identity) and warm (odometry-like 0.08 m offset) guesses, gated vs
fast_gicp per-iteration re-association. Same world as r2b_timing.py.
"""

from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np

from microbench import timeit


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import cloud as cloudlib, se3
    from hdl_graph_slam_tpu.registration import gicp, vgicp

    rng = np.random.default_rng(0)
    n = 8192
    n_half = n // 2
    floor = np.stack([rng.uniform(-20, 20, n_half), rng.uniform(-20, 20, n_half), rng.normal(0, 0.02, n_half)], 1)
    walls = np.stack([rng.uniform(-20, 20, n_half), rng.normal(15, 0.05, n_half), rng.uniform(0, 4, n_half)], 1)
    half = n_half // 2
    walls[half:] = walls[half:][:, [1, 0, 2]]
    pts = np.concatenate([floor, walls]).astype(np.float32)
    xi = jnp.asarray([0.2, -0.1, 0.02, 0.01, 0.01, 0.05], jnp.float32)
    T_true = se3.se3_exp(xi)
    tgt_pts = np.asarray(pts @ np.asarray(T_true)[:3, :3].T + np.asarray(T_true)[:3, 3], np.float32)
    src_c = cloudlib.from_numpy(pts, capacity=n)
    tgt_c = cloudlib.from_numpy(tgt_pts, capacity=n)
    t_true = np.asarray(T_true)[:3, 3]

    src_g = gicp.preprocess(src_c)
    tgt_g = gicp.preprocess(tgt_c)
    tgt_v = vgicp.preprocess_target(tgt_c, 1.0, max_voxels=8192)

    guesses = {
        "cold": jnp.eye(4, dtype=jnp.float32),
        # odometry-like: within 0.08 m + 0.5 deg of the truth
        "warm": np.asarray(se3.se3_exp(xi + jnp.asarray([0.05, -0.03, 0.01, 0.004, -0.003, 0.006]))),
    }
    for gname, guess in guesses.items():
        guess = jnp.asarray(guess, jnp.float32)
        for disp in (0.0, 0.1):
            for mname, fn in (
                ("gicp", lambda t, s, g, _d=disp: gicp.align(t, s, g, reassoc_displacement=_d)),
                ("vgicp", lambda t, s, g, _d=disp: vgicp.align(t, s, g, reassoc_displacement=_d)),
            ):
                tgt = tgt_g if mname == "gicp" else tgt_v
                jf = jax.jit(fn)
                r = jf(tgt, src_g, guess)
                terr = float(np.linalg.norm(np.asarray(r.transformation)[:3, 3] - t_true))
                dt = timeit(jf, tgt, src_g, guess, reps=10)
                print(json.dumps({
                    "metric": f"{mname}_{gname}_disp{disp}_ms", "value": round(dt * 1e3, 2),
                    "iters": int(r.iterations), "terr_m": round(terr, 4),
                }), flush=True)


if __name__ == "__main__":
    main()
