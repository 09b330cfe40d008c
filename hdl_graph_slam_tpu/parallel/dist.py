"""Multi-chip distribution: sharded loop-candidate registration and
distributed pose-graph optimization.

The reference has no distributed backend (SURVEY.md §2.5) — its concurrency
is OpenMP threads + nodelet pipeline. The TPU-native scaling axes are:

1. **Candidate-parallel registration** (replaces the sequential loop in
   loop_detector.hpp:135-154): the batch axis of vmapped GICP aligns is
   sharded over the device mesh; each chip aligns its slice of candidates.
2. **Edge-parallel graph linearization**: edge tables are sharded over the
   mesh; each chip linearizes its edge shard into a partial (H, b), reduced
   with psum over ICI; the damped solve runs replicated (dense H is small
   relative to the linearization work) and the manifold update is pure
   elementwise. This is the Hessian-reduction pattern from BASELINE.json's
   north star.

Everything works on any jax mesh — real TPU slices or the 8-virtual-device
CPU test mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map to the top level
    from jax import shard_map  # type: ignore[attr-defined]

    def _shard_map(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def _shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

from ..graph.linearize import apply_delta, build_system, free_dof_mask
from ..graph.types import EdgeTable, GraphData


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


# ---------------------------------------------------------------------------
# candidate-parallel registration
# ---------------------------------------------------------------------------


def sharded_candidate_align(mesh: Mesh, tgt_state, srcs, guesses, align_fn):
    """vmap(align) with the candidate axis sharded over the mesh.

    srcs: pytree with leading batch axis K (divisible by mesh size);
    guesses: (K, 4, 4). tgt_state is replicated. Returns batched results.
    """
    axis = mesh.axis_names[0]
    batch_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    srcs = jax.device_put(srcs, batch_sharding)
    guesses = jax.device_put(guesses, batch_sharding)
    tgt_state = jax.device_put(tgt_state, rep)

    fn = jax.jit(jax.vmap(lambda s, g: align_fn(tgt_state, s, g)))
    return fn(srcs, guesses)


# ---------------------------------------------------------------------------
# edge-parallel distributed LM
# ---------------------------------------------------------------------------


def _pad_edges_for_shards(data: GraphData, n_shards: int) -> GraphData:
    """Pad every edge table to a multiple of n_shards (mask=False rows)."""
    new_edges = {}
    for etype, t in data.edges.items():
        e = t.vi.shape[0]
        rem = (-e) % n_shards
        if rem == 0:
            # includes empty tables: a 0-length axis shards to 0 rows per
            # device and build_system skips them
            new_edges[etype] = t
            continue
        pad = lambda a: jnp.concatenate([a, jnp.zeros((rem,) + a.shape[1:], a.dtype)], axis=0)
        meas = t.meas
        if etype == "se3_se3":
            pad_meas = jnp.broadcast_to(jnp.eye(4, dtype=meas.dtype), (rem, 4, 4))
        else:
            pad_meas = jnp.zeros((rem,) + meas.shape[1:], meas.dtype)
        new_edges[etype] = EdgeTable(
            vi=pad(t.vi),
            vj=pad(t.vj),
            meas=jnp.concatenate([meas, pad_meas], axis=0),
            info=pad(t.info),
            kernel_id=pad(t.kernel_id),
            kernel_delta=jnp.concatenate([t.kernel_delta, jnp.ones((rem,), t.kernel_delta.dtype)], axis=0),
            mask=jnp.concatenate([t.mask, jnp.zeros((rem,), bool)], axis=0),
        )
    return dataclasses.replace(data, edges=new_edges)


def _optimize_specs(mesh: Mesh, data: GraphData):
    """(data_spec, out_spec) PartitionSpec trees for the edge-sharded LM."""
    axis = mesh.axis_names[0]
    edge_specs = {k: EdgeTable(vi=P(axis), vj=P(axis), meas=P(axis), info=P(axis),
                               kernel_id=P(axis), kernel_delta=P(axis), mask=P(axis))
                  for k in data.edges}
    rep = P()
    data_spec = GraphData(
        poses=rep, pose_fixed=rep, pose_mask=rep,
        planes=rep, plane_fixed=rep, plane_mask=rep,
        points=rep, point_fixed=rep, point_mask=rep,
        edges=edge_specs,
    )
    out_spec = (
        data_spec,
        jax.tree_util.tree_map(lambda _: rep, _stats_struct()),
    )
    return data_spec, out_spec


def _optimize_program(mesh: Mesh, data: GraphData, max_iterations: int):
    """Jitted shard_map program for the full edge-sharded LM loop (shared by
    the single-process and multi-process entry points)."""
    from ..graph.solver import _optimize_impl

    axis = mesh.axis_names[0]
    data_spec, out_spec = _optimize_specs(mesh, data)

    def prog(d: GraphData):
        out, stats = _optimize_impl(d, max_iterations, axis_name=axis)
        return out, stats

    return jax.jit(_shard_map(prog, mesh, in_specs=(data_spec,), out_specs=out_spec))


def distributed_optimize(mesh: Mesh, data: GraphData, max_iterations: int = 512):
    """Full LM optimization with edge-sharded linearization.

    The entire accept/reject loop (graph/solver._optimize_impl) runs inside
    one shard_map program: every device linearizes its |E|/n edge shard,
    partial (H, b, chi2) ride psum over ICI each iteration, the damped dense
    solve and vertex updates replicate. Semantically identical to the
    single-chip graph.solver.optimize (same reduction tree up to float
    reassociation).
    """
    n = mesh.devices.size
    data = _pad_edges_for_shards(data, n)
    return _optimize_program(mesh, data, max_iterations)(data)


def _stats_struct():
    from ..graph.solver import OptimizeStats

    z = 0
    return OptimizeStats(iterations=z, chi2_before=z, chi2_after=z,
                         chi2_robust_before=z, chi2_robust_after=z, lam_final=z)


def distributed_lm_step(mesh: Mesh, data: GraphData, lam) -> tuple[GraphData, jax.Array]:
    """One LM iteration with edge-sharded linearization + psum reduction.

    Returns (updated GraphData, chi2_robust_before). The accept/reject logic
    lives in the caller (or use graph.solver.optimize on one chip); this is
    the scaling kernel: each device linearizes |E|/n edges, H/b ride a psum.
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    data = _pad_edges_for_shards(data, n)

    vertex_fields = dict(
        poses=data.poses, pose_fixed=data.pose_fixed, pose_mask=data.pose_mask,
        planes=data.planes, plane_fixed=data.plane_fixed, plane_mask=data.plane_mask,
        points=data.points, point_fixed=data.point_fixed, point_mask=data.point_mask,
    )

    edge_specs = {k: EdgeTable(vi=P(axis), vj=P(axis), meas=P(axis), info=P(axis),
                               kernel_id=P(axis), kernel_delta=P(axis), mask=P(axis))
                  for k in data.edges}

    def step(edges, poses, pose_fixed, pose_mask, planes, plane_fixed, plane_mask,
             points, point_fixed, point_mask, lam_in):
        local = GraphData(poses=poses, pose_fixed=pose_fixed, pose_mask=pose_mask,
                          planes=planes, plane_fixed=plane_fixed, plane_mask=plane_mask,
                          points=points, point_fixed=point_fixed, point_mask=point_mask,
                          edges=edges)
        H, b, chi2_raw, chi2_rob = build_system(local)
        H = jax.lax.psum(H, axis)
        b = jax.lax.psum(b, axis)
        chi2_rob = jax.lax.psum(chi2_rob, axis)
        free = free_dof_mask(local).astype(H.dtype)
        Hf = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        bf = b * free
        dx = -jnp.linalg.solve(Hf + lam_in * jnp.diag(free), bf)
        updated = apply_delta(local, dx)
        return updated.poses, updated.planes, updated.points, chi2_rob

    rep = P()
    fn = _shard_map(
        step,
        mesh,
        in_specs=(edge_specs, rep, rep, rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep, rep),
    )
    poses, planes, points, chi2 = jax.jit(fn)(
        data.edges, *vertex_fields.values(), jnp.asarray(lam, data.poses.dtype)
    )
    out = dataclasses.replace(data, poses=poses, planes=planes, points=points)
    return out, chi2
