"""Worker process for the two-process jax.distributed test
(tests/test_multiprocess.py). Launched as:

    python tests/mp_worker.py <coordinator> <num_processes> <process_id> <outdir>

with JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_device_count=4
so two processes form a real 8-device multi-process mesh over the
jax distributed runtime (a genuine process/DCN boundary, not virtual
devices in one process — SURVEY.md §2.5 multi-host mapping).
"""

import os
import sys


def build_graph():
    """Deterministic noisy pose chain + loop edges (identical on every
    process and in the verifying test)."""
    import numpy as np

    from hdl_graph_slam_tpu.core import se3
    from hdl_graph_slam_tpu.graph import GraphBuilder
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    g = GraphBuilder()
    ids = []
    est = np.eye(4)
    n = 24
    for k in range(n):
        if k == 0:
            ids.append(g.add_se3_node(np.eye(4), fixed=True))
            continue
        rel_true = np.eye(4)
        ang = 2 * np.pi / n
        rel_true[:2, :2] = [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
        rel_true[0, 3] = 1.0
        noise = np.asarray(
            se3.se3_exp(jnp.asarray(np.concatenate([rng.normal(0, 0.03, 3), rng.normal(0, 0.015, 3)])))
        )
        rel_noisy = rel_true @ noise
        est = est @ rel_noisy
        ids.append(g.add_se3_node(est))
        g.add_se3_edge(ids[k], ids[k - 1], np.linalg.inv(rel_noisy), np.eye(6) * 100.0)
    # loop closure: last node back to the first (circle closes at identity^-1 * est)
    g.add_se3_edge(ids[-1], ids[0], np.linalg.inv(np.linalg.inv(np.eye(4)) @
                                                  _true_pose(n - 1, n)), np.eye(6) * 100.0)
    return g


def _true_pose(k, n):
    import numpy as np

    est = np.eye(4)
    ang = 2 * np.pi / n
    rel = np.eye(4)
    rel[:2, :2] = [[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]]
    rel[0, 3] = 1.0
    for _ in range(k):
        est = est @ rel
    return est


def main():
    coordinator, nproc, pid, outdir = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from hdl_graph_slam_tpu.parallel import multihost

    multihost.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()  # mesh spans processes
    assert jax.local_device_count() == 4, jax.local_device_count()

    import jax.numpy as jnp
    import numpy as np

    data = build_graph().freeze(dtype=jnp.float64)
    out, stats = multihost.distributed_optimize_multihost(data, max_iterations=50)
    if pid == 0:
        np.savez(
            os.path.join(outdir, "result.npz"),
            poses=np.asarray(out.poses),
            chi2_before=float(stats.chi2_robust_before),
            chi2_after=float(stats.chi2_robust_after),
        )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
