"""Scaling-efficiency harness: distributed LM throughput over mesh sizes.

Runs the edge-sharded distributed optimizer on 1..N devices of whatever
platform is available and reports iterations/s + efficiency vs 1 device.
On the CPU virtual mesh this validates mechanics (virtual devices share
one socket, so efficiency there is not a hardware number); on a real TPU
slice the same script produces the BASELINE.md scaling metric.
"""

from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def build_graph(n_poses=256, loops_every=16):
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.graph import GraphBuilder

    g = GraphBuilder()
    ids = []
    est = np.eye(4)
    rng = np.random.default_rng(0)
    for k in range(n_poses):
        if k == 0:
            ids.append(g.add_se3_node(np.eye(4), fixed=True))
            continue
        rel = np.eye(4)
        rel[0, 3] = 1.0
        est = est @ rel
        ids.append(g.add_se3_node(est @ np.diag([1.0, 1, 1, 1])))
        g.add_se3_edge(ids[k], ids[k - 1], np.linalg.inv(rel), np.eye(6) * 10)
    for k in range(loops_every, n_poses, loops_every):
        g.add_se3_edge(ids[k], ids[k - loops_every], np.eye(4), np.eye(6), kernel="Huber")
    return g.freeze(dtype=jnp.float32)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # voxel int64 keys

    from hdl_graph_slam_tpu.parallel import distributed_optimize, make_mesh

    data = build_graph()
    n_avail = len(jax.devices())
    results = {}
    for n in [1, 2, 4]:
        if n > n_avail:
            break
        mesh = make_mesh(n)
        out, stats = distributed_optimize(mesh, data, max_iterations=15)  # compile+warm (distinct program)
        t0 = time.perf_counter()
        out, stats = distributed_optimize(mesh, data, max_iterations=16)
        np.asarray(out.poses)  # host materialization — the only reliable fence through the tunnel
        dt = time.perf_counter() - t0
        iters = max(1, int(stats.iterations))
        results[n] = iters / dt
        eff = results[n] / (results[1] * n) if 1 in results else 1.0
        print(json.dumps({
            "metric": "distributed_lm_iters_per_s",
            "devices": n,
            "value": round(results[n], 2),
            "efficiency_vs_1dev": round(eff, 3),
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
