"""Microbenchmarks for the hot kernels (SURVEY.md §7 step 10).

Prints one JSON line per metric. Run on the TPU (default env) or CPU
(JAX_PLATFORMS=cpu). The driver-facing headline metric lives in /bench.py;
these are the per-kernel speed-of-light diagnostics.
"""

from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def timeit(fn, *args, reps=100):
    """Honest device timing through the axon tunnel (PERF.md "Measurement
    discipline"): block_until_ready is not a reliable fence there and an
    identical re-dispatch can be short-circuited, so (a) all reps run inside
    ONE lax.scan with a serial carry dependence threaded through the first
    float input (prevents loop-invariant hoisting; value unchanged), (b) the
    warmup uses perturbed inputs so the timed dispatch is distinct, and (c)
    the timed call materializes its scalar reduction to host."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(args)
    fidx = next(
        i for i, l in enumerate(leaves)
        if hasattr(l, "dtype") and jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
    )

    @jax.jit
    def run(leaves):
        def body(c, _):
            ls = list(leaves)
            ls[fidx] = ls[fidx] + c * 1e-30  # serial dependence, value unchanged
            out = fn(*jax.tree_util.tree_unflatten(treedef, ls))
            red = jnp.float32(0)
            for o in jax.tree_util.tree_leaves(out):
                o = jnp.asarray(o)
                if jnp.issubdtype(o.dtype, jnp.bool_):
                    o = o.astype(jnp.float32)
                red = red + jnp.sum(o).astype(jnp.float32)
            return red, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    warm = list(leaves)
    warm[fidx] = jnp.asarray(warm[fidx]) + 1e-6
    np.asarray(run(warm))  # compile + warm on DISTINCT inputs
    t0 = time.perf_counter()
    np.asarray(run(leaves))
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # voxel int64 keys
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import cloud as cloudlib, se3
    from hdl_graph_slam_tpu.graph import GraphBuilder
    from hdl_graph_slam_tpu.graph.linearize import build_system
    from hdl_graph_slam_tpu.graph.solver import optimize
    from hdl_graph_slam_tpu.ops import knn, voxel
    from hdl_graph_slam_tpu.registration import gicp  # noqa

    results = []
    rng = np.random.default_rng(0)

    n = 8192
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    c = cloudlib.from_numpy(pts, capacity=n)
    xyz = c.valid_xyz()

    dt = timeit(jax.jit(lambda a, b: knn.nn1(a, b)), xyz, xyz)
    results.append({"metric": "nn1_8192x8192_ms", "value": round(dt * 1e3, 3), "unit": "ms"})
    results.append(
        {"metric": "nn1_throughput", "value": round(n * n / dt / 1e9, 1), "unit": "Gpairs/s"}
    )

    dt = timeit(jax.jit(lambda a, b: knn.knn(a, b, 20)), xyz, xyz)
    results.append({"metric": "knn20_8192_ms", "value": round(dt * 1e3, 3), "unit": "ms"})

    dt = timeit(
        jax.jit(lambda cl: voxel.voxel_downsample(cl, 0.5, max_voxels=8192)), c
    )
    results.append({"metric": "voxel_downsample_8192_ms", "value": round(dt * 1e3, 3), "unit": "ms"})

    from hdl_graph_slam_tpu.registration import gicp

    pp = jax.jit(lambda cl: gicp.preprocess(cl))
    dt = timeit(pp, c)
    results.append({"metric": "gicp_preprocess_8192_ms", "value": round(dt * 1e3, 3), "unit": "ms"})

    # graph optimization iterations/s: 256-pose chain + loops
    g = GraphBuilder()
    ids = []
    est = np.eye(4)
    for k in range(256):
        if k == 0:
            ids.append(g.add_se3_node(np.eye(4), fixed=True))
            continue
        rel = np.eye(4)
        rel[0, 3] = 1.0
        est = est @ rel
        ids.append(g.add_se3_node(est))
        g.add_se3_edge(ids[k], ids[k - 1], np.linalg.inv(rel), np.eye(6) * 10)
    for k in range(16, 256, 16):
        g.add_se3_edge(ids[k], ids[k - 16], np.eye(4), np.eye(6), kernel="Huber")
    data = g.freeze(dtype=jnp.float32)

    lin = jax.jit(lambda d: build_system(d))
    dt = timeit(lin, data, reps=50)
    results.append({"metric": "graph_linearize_256pose_ms", "value": round(dt * 1e3, 3), "unit": "ms"})

    opt = jax.jit(lambda d: optimize(d, max_iterations=32))
    dt = timeit(opt, data, reps=5)
    _, stats = opt(data)
    iters = int(stats.iterations)
    results.append(
        {"metric": "graph_lm_iters_per_s_256pose", "value": round(iters / dt, 1), "unit": "iters/s"}
    )

    for r in results:
        print(json.dumps(r))




def bench_registration_variants():
    """NDT / VGICP / ICP align timings at odometry sizes (run after main)."""
    import jax
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import cloud as cloudlib, se3
    from hdl_graph_slam_tpu.registration import gicp, icp, ndt, vgicp

    rng = np.random.default_rng(1)
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

    results = []

    tgt_g = gicp.preprocess(tgt_c)
    src_g = gicp.preprocess(src_c)
    dt = timeit(jax.jit(lambda t, s, g: gicp.align(t, s, g)), tgt_g, src_g, guess, reps=10)
    results.append({"metric": "gicp_align_ms", "value": round(dt * 1e3, 2), "unit": "ms"})

    tgt_v = vgicp.preprocess_target(tgt_c, 1.0, max_voxels=8192)
    dt = timeit(jax.jit(lambda t, s, g: vgicp.align(t, s, g)), tgt_v, src_g, guess, reps=10)
    results.append({"metric": "vgicp_align_ms", "value": round(dt * 1e3, 2), "unit": "ms"})

    tgt_n = ndt.preprocess_target(tgt_c, 2.0, max_voxels=8192)
    dt = timeit(jax.jit(lambda t, s, g: ndt.align(t, s, g)), tgt_n, src_c, guess, reps=10)
    results.append({"metric": "ndt_align_ms", "value": round(dt * 1e3, 2), "unit": "ms"})

    dt = timeit(jax.jit(lambda t, s, g: icp.align(t, s, g)), tgt_c, src_c, guess, reps=10)
    results.append({"metric": "icp_align_ms", "value": round(dt * 1e3, 2), "unit": "ms"})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "variants":
        bench_registration_variants()
    else:
        main()
