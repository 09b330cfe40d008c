"""Two-process jax.distributed test: the edge-sharded LM must cross a REAL
process boundary (jax distributed runtime, 2 processes x 4 virtual CPU
devices = one 8-device global mesh) and land on the single-process optimum.

This is the multi-host mechanics check from SURVEY.md §2.5 / VERDICT r1 #4 —
shard_map + psum over a mesh that spans processes, not just virtual devices
inside one interpreter.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_optimize(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        # drop the axon sitecustomize; keep the repo importable
        PYTHONPATH=REPO,
    )
    workers = []
    for pid in range(2):
        workers.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
                 coordinator, "2", str(pid), str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for w in workers:
        try:
            out, _ = w.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            raise
        outs.append(out)
    for w, out in zip(workers, outs):
        assert w.returncode == 0, out[-3000:]

    result = np.load(tmp_path / "result.npz")

    # single-process reference optimum (same graph, same iteration budget)
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.graph.solver import optimize as graph_optimize
    from tests.mp_worker import build_graph

    data = build_graph().freeze(dtype=jnp.float64)
    ref, ref_stats = graph_optimize(data, max_iterations=50)

    assert float(result["chi2_after"]) < float(result["chi2_before"])
    np.testing.assert_allclose(result["poses"], np.asarray(ref.poses), atol=1e-5)
    assert abs(float(result["chi2_after"]) - float(ref_stats.chi2_robust_after)) < 1e-6 * (
        1.0 + float(ref_stats.chi2_robust_after)
    )
