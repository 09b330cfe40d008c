"""NDT/VGICP align with motion-gated re-association + adaptive dense grid.

Same world/guess as r2b_timing.py's NDT block (8k pts, xi=[0.2,-0.1,0.02,
0.01,0.01,0.05] offset, identity guess), so the numbers are directly
comparable to the 13.3 ms round-2b table entry. Reports time, iterations,
and translation error vs the known truth for each configuration.
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
    from hdl_graph_slam_tpu.ops import voxel as V
    from hdl_graph_slam_tpu.registration import gicp, ndt, vgicp

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
    guess = jnp.eye(4, dtype=jnp.float32)
    t_true = np.asarray(T_true)[:3, 3]

    for G in (256, V.dense_grid_size_for(2.0)):
        tgt_n = ndt.preprocess_target(tgt_c, 2.0, max_voxels=8192, grid_size=G)
        for reassoc in (0.0, 0.5):  # meters; 0.5 = a quarter cell at res 2.0
            fn = jax.jit(
                lambda t, s, g, _r=reassoc: ndt.align(
                    t, s, g, nn_search_method="DIRECT7", reassoc_displacement=_r
                )
            )
            res = fn(tgt_n, src_c, guess)
            iters = int(res.iterations)
            terr = float(np.linalg.norm(np.asarray(res.transformation)[:3, 3] - t_true))
            dt = timeit(fn, tgt_n, src_c, guess, reps=10)
            print(json.dumps({
                "metric": f"ndt_direct7_G{G}_reassoc{reassoc}_ms",
                "value": round(dt * 1e3, 2), "iters": iters, "terr_m": round(terr, 4),
            }), flush=True)

    # VGICP with the adaptive grid (res 1.0 -> still 256, just confirm parity)
    src_g = gicp.preprocess(src_c)
    for G in (256, V.dense_grid_size_for(1.0)):
        tgt_v = vgicp.preprocess_target(tgt_c, 1.0, max_voxels=8192, grid_size=G)
        fn = jax.jit(lambda t, s, g: vgicp.align(t, s, g))
        res = fn(tgt_v, src_g, guess)
        terr = float(np.linalg.norm(np.asarray(res.transformation)[:3, 3] - t_true))
        dt = timeit(fn, tgt_v, src_g, guess, reps=10)
        print(json.dumps({
            "metric": f"vgicp_G{G}_ms", "value": round(dt * 1e3, 2),
            "iters": int(res.iterations), "terr_m": round(terr, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
