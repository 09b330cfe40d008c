"""Multi-process (multi-host) distributed graph optimization.

The reference is strictly single-process (SURVEY.md §2.5). The TPU-native
scaling story crosses real process boundaries with `jax.distributed`: every
host runs the same program, the global mesh spans all hosts' devices, edge
tables shard per process over DCN/ICI, and the (H, b, chi2) reductions ride
XLA collectives exactly as in the single-process `parallel.dist` path — the
program is byte-identical, only the array placement differs.

Usage (same on every process):

    initialize(coordinator, num_processes, process_id)
    mesh = make_mesh()                         # spans ALL processes' devices
    out, stats = distributed_optimize_multihost(data, max_iterations=...)

Each process passes the SAME full GraphData (graphs are small relative to
clouds; keyframe clouds themselves never need to leave their host — see
parallel/partition.py for the per-host keyframe/submap partitioning that
feeds this optimizer). Verified by a real two-process CPU test
(tests/test_multiprocess.py) against the single-process optimum.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.types import GraphData
from .dist import _optimize_program, _optimize_specs, _pad_edges_for_shards, make_mesh


def initialize(coordinator_address: str, num_processes: int, process_id: int) -> None:
    """Bring up the jax distributed runtime (idempotent per process)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _to_global(mesh: Mesh, tree, spec_tree):
    """Convert host-local (identical-on-every-process) arrays into global
    jax.Arrays laid out per ``spec_tree`` over the multi-process mesh.

    Replicated leaves pass through whole; sharded leaves are sliced to this
    process's contiguous row block first (make_mesh orders devices by
    process index, so shard i of the leading axis lives on global device i).
    """
    from jax.experimental import multihost_utils

    pid = jax.process_index()
    nproc = jax.process_count()

    def conv(x, spec):
        x = np.asarray(x)
        if len(spec) > 0 and spec[0] is not None:  # sharded leading axis
            per = x.shape[0] // nproc
            x = x[pid * per : (pid + 1) * per]
        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)

    return jax.tree_util.tree_map(conv, tree, spec_tree)


def distributed_optimize_multihost(data: GraphData, max_iterations: int = 512):
    """Edge-sharded LM over the global (all-process) mesh.

    Returns (GraphData, OptimizeStats) as numpy on every process (outputs
    are replicated, hence addressable everywhere).
    """
    mesh = make_mesh()
    n = mesh.devices.size
    data = _pad_edges_for_shards(data, n)
    data_spec, _ = _optimize_specs(mesh, data)
    gdata = _to_global(mesh, data, data_spec)
    out, stats = _optimize_program(mesh, data, max_iterations)(gdata)
    to_np = lambda t: jax.tree_util.tree_map(lambda x: np.asarray(x), t)
    # edge tables stay sharded; only the (replicated) vertex estimates are
    # host-readable — return them, dropping the device-sharded edges
    out_np = dataclasses.replace(
        to_np(dataclasses.replace(out, edges={})), edges=data.edges
    )
    return out_np, to_np(stats)
