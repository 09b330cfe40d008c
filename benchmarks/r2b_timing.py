"""Round-2b optimization deltas, measured on the real chip.

Times the before/after of each candidate lever (PERF.md "Round-3+ ideas"):
- int32 local-key voxel downsample vs the int64 global-key path (prefilter)
- the full fused prefilter program at bench shapes (16384 raw -> 0.2 m grid)
- NDT DIRECT7 fixed-cell line search vs per-trial re-association
- nn1 XLA reduce vs the fused Pallas kernel at odometry shapes

Prints one JSON line per metric (same discipline as microbench.timeit:
serial-carry scan, distinct-input warmup, host materialization).
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
    from hdl_graph_slam_tpu.core.config import PrefilterConfig
    from hdl_graph_slam_tpu.frontend.prefilter import make_prefilter_fn
    from hdl_graph_slam_tpu.ops import knn, voxel
    from hdl_graph_slam_tpu.ops.pallas_nn import nn1_pallas
    from hdl_graph_slam_tpu.registration import gicp, icp, ndt, vgicp

    results = []
    rng = np.random.default_rng(0)

    # --- bench-shaped raw scan (15k pts within 50 m) ------------------------
    n_raw = 16384
    raw = rng.uniform(-50, 50, (n_raw, 3)).astype(np.float32)
    raw[:, 2] = rng.uniform(0, 4, n_raw)
    c_raw = cloudlib.from_numpy(raw, capacity=n_raw)

    dt = timeit(jax.jit(lambda cl: voxel.voxel_downsample(cl, 0.2, max_voxels=8192)), c_raw)
    results.append({"metric": "voxel_downsample_int64_16k_ms", "value": round(dt * 1e3, 3)})
    dt = timeit(jax.jit(lambda cl: voxel.voxel_downsample_local(cl, 0.2, max_voxels=8192)), c_raw)
    results.append({"metric": "voxel_downsample_local_int32_16k_ms", "value": round(dt * 1e3, 3)})

    cfg = PrefilterConfig(downsample_resolution=0.2, outlier_removal_method="NONE")
    pf = make_prefilter_fn(cfg, out_capacity=8192)
    eye = jnp.eye(4, dtype=jnp.float32)
    zero3 = jnp.zeros(3, jnp.float32)
    dt = timeit(jax.jit(pf), c_raw, eye, zero3)
    results.append({"metric": "prefilter_fused_local_ms", "value": round(dt * 1e3, 3)})

    # global-key prefilter for comparison (force the old path via a huge far)
    cfg_g = PrefilterConfig(
        downsample_resolution=0.2, outlier_removal_method="NONE", distance_far_thresh=1e5
    )
    pf_g = make_prefilter_fn(cfg_g, out_capacity=8192)
    dt = timeit(jax.jit(pf_g), c_raw, eye, zero3)
    results.append({"metric": "prefilter_fused_int64_ms", "value": round(dt * 1e3, 3)})

    # --- NDT DIRECT7: fixed-cell vs re-associating line search --------------
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

    tgt_n = ndt.preprocess_target(tgt_c, 2.0, max_voxels=8192)
    for fixed, tag in ((True, "fixed_cells"), (False, "retrial_cells")):
        fn = jax.jit(
            lambda t, s, g, _f=fixed: ndt.align(
                t, s, g, nn_search_method="DIRECT7", line_search_fixed_cells=_f
            )
        )
        res = fn(tgt_n, src_c, guess)
        iters = int(res.iterations)
        dt = timeit(fn, tgt_n, src_c, guess, reps=10)
        results.append(
            {"metric": f"ndt_direct7_{tag}_ms", "value": round(dt * 1e3, 2), "iters": iters}
        )

    # shorter line search (5 trials instead of 10) — candidate lever
    fn5 = jax.jit(
        lambda t, s, g: ndt.align(t, s, g, nn_search_method="DIRECT7", num_line_search=5)
    )
    res5 = fn5(tgt_n, src_c, guess)
    dt = timeit(fn5, tgt_n, src_c, guess, reps=10)
    results.append(
        {"metric": "ndt_direct7_trials5_ms", "value": round(dt * 1e3, 2), "iters": int(res5.iterations)}
    )

    # --- ICP (single align: the 64-align scan program crashes the remote
    # compiler; one align compiles fine) --------------------------------------
    fn_icp = jax.jit(lambda t, s, g: icp.align(t, s, g))
    res_icp = fn_icp(tgt_c, src_c, guess)
    dt = timeit(fn_icp, tgt_c, src_c, guess, reps=10)
    results.append(
        {"metric": "icp_align_ms", "value": round(dt * 1e3, 2), "iters": int(res_icp.iterations)}
    )

    # --- VGICP + GICP aligns (resolution-dtype fix check) --------------------
    src_g = gicp.preprocess(src_c)
    tgt_g = gicp.preprocess(tgt_c)
    dt = timeit(jax.jit(lambda t, s, g: gicp.align(t, s, g)), tgt_g, src_g, guess, reps=10)
    results.append({"metric": "gicp_align_ms", "value": round(dt * 1e3, 2)})
    tgt_v = vgicp.preprocess_target(tgt_c, 1.0, max_voxels=8192)
    dt = timeit(jax.jit(lambda t, s, g: vgicp.align(t, s, g)), tgt_v, src_g, guess, reps=10)
    results.append({"metric": "vgicp_align_ms", "value": round(dt * 1e3, 2)})

    # --- nn1: XLA vs Pallas at odometry shapes ------------------------------
    xyz = src_c.valid_xyz()
    t_xyz = tgt_c.valid_xyz()
    dt = timeit(jax.jit(lambda a, b: knn.nn1(a, b)), xyz, t_xyz)
    results.append({"metric": "nn1_xla_8192_ms", "value": round(dt * 1e3, 3)})
    try:
        i_p, d_p = nn1_pallas(xyz, t_xyz)
        i_x, d_x = knn.nn1(xyz, t_xyz)
        agree = float(jnp.mean((jnp.abs(d_p - d_x) < 1e-4).astype(jnp.float32)))
        dt = timeit(jax.jit(nn1_pallas), xyz, t_xyz)
        results.append(
            {"metric": "nn1_pallas_8192_ms", "value": round(dt * 1e3, 3), "dist_agree": agree}
        )
    except Exception as e:  # pallas lowering may fail on some backends
        results.append({"metric": "nn1_pallas_8192_ms", "error": repr(e)[:200]})

    # --- gicp.preprocess breakdown ------------------------------------------
    dt = timeit(jax.jit(lambda cl: gicp.preprocess(cl)), src_c)
    results.append({"metric": "gicp_preprocess_8192_ms", "value": round(dt * 1e3, 3)})
    dt = timeit(
        jax.jit(lambda a: knn.knn_approx(a, a, 20, recall_target=0.9, exact_dists=False)), xyz
    )
    results.append({"metric": "knn_approx_sel_only_8192_ms", "value": round(dt * 1e3, 3)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
