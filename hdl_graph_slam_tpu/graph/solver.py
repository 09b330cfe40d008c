"""Levenberg-Marquardt pose-graph solver, fully on device.

Replaces g2o::SparseOptimizer + OptimizationAlgorithmLevenberg
(GraphSLAM::optimize, src/hdl_graph_slam/graph_slam.cpp:292-321; 512
iterations per backend cycle per launch/hdl_graph_slam.launch:106-107).

Per iteration: batched linearization of all edge tables (linearize.py),
damped dense solve (H + lam*I) dx = -b over the free dofs, manifold update,
chi2-gated accept/reject with Nielsen damping — g2o's Levenberg loop
expressed as a lax.while_loop.

The dense factorization is the right call at hdl_graph_slam scales (a few
thousand keyframes => D ~ 1e4): one D^2 f32 buffer fits HBM easily and XLA's
Cholesky saturates the MXU, where a sparse CHOLMOD-style factorization would
serialize. Multi-host Schur partitioning extends this (parallel/).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .linearize import apply_delta, build_system, chi2_only, free_dof_mask
from .types import GraphData


class OptimizeStats(NamedTuple):
    iterations: jax.Array
    chi2_before: jax.Array
    chi2_after: jax.Array
    chi2_robust_before: jax.Array
    chi2_robust_after: jax.Array
    lam_final: jax.Array


class _State(NamedTuple):
    data: GraphData
    lam: jax.Array
    nu: jax.Array
    it: jax.Array
    chi2: jax.Array  # current robustified chi2 (the LM objective)
    done: jax.Array


@partial(jax.jit, static_argnames=("max_iterations", "linear_solver"))
def optimize(data: GraphData, max_iterations: int = 512, linear_solver: str = "dense") -> tuple[GraphData, OptimizeStats]:
    """Run LM for up to max_iterations accept/reject steps.

    linear_solver:
    - "dense": MXU Cholesky over all dofs (optimal to a few thousand poses);
    - "schur": eliminate plane/point landmark blocks first (graph/schur.py —
      g2o's landmark marginalization; requires no landmark-landmark edges,
      which HdlGraphSlam never creates);
    - "pcg": matrix-free block-Jacobi CG for very large graphs where the
      dense D^2 Hessian no longer makes sense (graph/pcg.py).
    """
    if linear_solver == "schur":
        from .schur import has_landmark_coupling

        if has_landmark_coupling(data):
            raise ValueError(
                "linear_solver='schur' requires a block-diagonal landmark block; "
                "this graph has plane-plane edges — use 'dense'"
            )
    return _optimize_impl(data, max_iterations, axis_name=None, linear_solver=linear_solver)


def _optimize_impl(data: GraphData, max_iterations: int, axis_name=None, linear_solver: str = "dense") -> tuple[GraphData, OptimizeStats]:
    """LM core; with ``axis_name`` the edge tables are assumed sharded over
    that shard_map mesh axis and partial H/b/chi2 are psum-reduced (the
    solve and vertex updates run replicated on every device)."""
    dtype = data.poses.dtype
    free = free_dof_mask(data)
    D = data.num_dof
    eyeD = jnp.eye(D, dtype=dtype)

    chi2_raw0, chi2_rob0 = chi2_only(data, axis_name)

    H0, _, _, _ = build_system(data, axis_name)
    # g2o computeLambdaInit: tau * max diagonal over free dofs
    diag0 = jnp.where(free, jnp.diag(H0), 0.0)
    lam0 = 1e-5 * jnp.max(diag0)
    lam0 = jnp.where(lam0 > 0, lam0, jnp.asarray(1e-5, dtype))

    def cond(s: _State):
        return (s.it < max_iterations) & jnp.logical_not(s.done)

    def body(s: _State):
        free_f = free.astype(dtype)
        if linear_solver == "pcg":
            from .pcg import linearize_blocks, solve_pcg

            sys_ = linearize_blocks(s.data)
            chi2_rob = sys_.chi2_robust
            bf = sys_.b * free_f
            dx = solve_pcg(sys_, s.lam, free)
        elif linear_solver == "schur":
            from .schur import solve_schur

            H, b, _, chi2_rob = build_system(s.data, axis_name)
            Hf = H * free_f[:, None] * free_f[None, :] + jnp.diag(1.0 - free_f)
            bf = b * free_f
            dx = solve_schur(Hf + s.lam * jnp.diag(free_f), bf, 6 * s.data.poses.shape[0])
        else:
            H, b, _, chi2_rob = build_system(s.data, axis_name)
            # restrict to free dofs: zero fixed rows/cols, unit diagonal
            Hf = H * free_f[:, None] * free_f[None, :] + jnp.diag(1.0 - free_f)
            bf = b * free_f
            # damped system is SPD (H PSD from J^T W J with rho'>=0 kernels,
            # + lam on the free diagonal, unit diagonal on fixed dofs):
            # Cholesky beats the generic LU solve on the MXU
            A = Hf + s.lam * jnp.diag(free_f)
            L = jnp.linalg.cholesky(A)
            dx = -jax.scipy.linalg.cho_solve((L, True), bf)
        data_new = apply_delta(s.data, dx)
        _, chi2_new = chi2_only(data_new, axis_name)

        accept = (chi2_new < chi2_rob) & jnp.isfinite(chi2_new)
        denom = jnp.dot(dx, s.lam * dx - bf)
        rho = (chi2_rob - chi2_new) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        lam_acc = s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam_acc, s.lam * s.nu)
        nu = jnp.where(accept, 2.0, 2.0 * s.nu)

        data_next = jax.tree_util.tree_map(
            lambda new, old: jnp.where(accept, new, old) if new.dtype != jnp.bool_ else old,
            data_new,
            s.data,
        )
        step_small = accept & (jnp.max(jnp.abs(dx)) < 1e-10)
        lam_blown = lam > 1e30
        chi2_cur = jnp.where(accept, chi2_new, chi2_rob)
        return _State(
            data=data_next,
            lam=lam,
            nu=nu,
            it=s.it + 1,
            chi2=chi2_cur,
            done=step_small | lam_blown,
        )

    init = _State(
        data=data,
        lam=lam0,
        nu=jnp.asarray(2.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        chi2=chi2_rob0,
        done=jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, body, init)
    chi2_raw1, chi2_rob1 = chi2_only(final.data, axis_name)
    stats = OptimizeStats(
        iterations=final.it,
        chi2_before=chi2_raw0,
        chi2_after=chi2_raw1,
        chi2_robust_before=chi2_rob0,
        chi2_robust_after=chi2_rob1,
        lam_final=final.lam,
    )
    return final.data, stats
