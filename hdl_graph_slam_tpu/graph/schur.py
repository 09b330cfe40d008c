"""Schur-complement elimination of landmark (plane/point) vertices.

g2o's BlockSolver marginalizes landmark vertices before the pose solve
(the solver roles behind GraphSLAM::optimize, src/hdl_graph_slam/
graph_slam.cpp:28-30 — lm_var/csparse/cholmod all eliminate the 3-dof
vertex blocks). The dense-MXU equivalent: with the state layout
[poses 6Np | planes 3Nl | points 3Nm] (graph/linearize.py), the damped
system A = H + lam*diag partitions as

    [App Apl] [dxp]   [-bp]
    [Alp All] [dxl] = [-bl]

where All is BLOCK-DIAGONAL (3x3 per landmark) whenever no landmark-
landmark edges exist — true for the hdl_graph_slam graph (landmarks touch
only SE3 poses through se3_plane / se3_point_xyz / prior edges). Then

    S  = App - Apl All^-1 Alp          (reduced pose system, 6Np x 6Np)
    S dxp = -(bp - Apl All^-1 bl)
    dxl = -All^-1 (bl + Alp dxp)

All^-1 is a batched closed-form 3x3 inverse; the dense factorization
shrinks from (6Np+3NL)^3 to (6Np)^3 — the right scaling when plane/point
landmarks multiply.

Caveat (checked by the caller): plane-plane edges (plane_identity /
plane_parallel / plane_perpendicular) couple landmark blocks and break the
block-diagonal structure; use linear_solver="dense" for such graphs.
HdlGraphSlam itself only ever creates se3_plane edges to the shared floor
node (hdl_graph_slam_nodelet.cpp:490-498), so Schur always applies there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import GraphData

# edge types whose BOTH endpoints are landmarks (break All block-diagonality)
LANDMARK_COUPLING_EDGES = ("plane_identity", "plane_parallel", "plane_perpendicular")


def has_landmark_coupling(data: GraphData) -> bool:
    """Static (shape-level) check: any landmark-landmark edge table allocated."""
    return any(
        data.edges.get(k) is not None and data.edges[k].vi.shape[0] > 0
        for k in LANDMARK_COUPLING_EDGES
    )


def _inv3x3(m: jax.Array) -> jax.Array:
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def solve_schur(A: jax.Array, b: jax.Array, n_pose_dof: int) -> jax.Array:
    """Solve A dx = -b by eliminating the trailing landmark block.

    ``A`` must already be damped and free-dof masked (unit diagonal on fixed
    dofs — graph/solver.py does this), with landmark dofs after the first
    ``n_pose_dof`` rows and a block-diagonal landmark-landmark part.
    """
    P = n_pose_dof
    L = A.shape[0] - P
    if L == 0:
        return -jnp.linalg.solve(A, b)
    nL = L // 3

    App = A[:P, :P]
    Apl = A[:P, P:]
    bl = b[P:]
    bp = b[:P]

    # 3x3 diagonal blocks of All
    blk = A[P:, P:].reshape(nL, 3, nL, 3)
    diag_blocks = blk[jnp.arange(nL), :, jnp.arange(nL), :]  # (nL, 3, 3)
    binv = _inv3x3(diag_blocks)

    # Apl @ All^-1  (P, L)
    W = jnp.einsum("pkj,kji->pki", Apl.reshape(P, nL, 3), binv).reshape(P, L)
    S = App - W @ Apl.T  # Alp = Apl^T (A symmetric)
    rhs = bp - W @ bl
    dxp = -jnp.linalg.solve(S, rhs)
    dxl = -jnp.einsum("kij,kj->ki", binv, (bl + Apl.T @ dxp).reshape(nL, 3)).reshape(L)
    return jnp.concatenate([dxp, dxl])
