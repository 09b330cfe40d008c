"""Matrix-free block-preconditioned conjugate gradient for large graphs.

The dense Cholesky in graph/solver.py is optimal on TPU up to a few
thousand keyframes (the MXU eats D^3/3 flops, D^2 f32 fits HBM). Beyond
that the right tool is matrix-free PCG: the Gauss-Newton matvec

    H x = sum_e J_e^T (w_e Omega_e) J_e x_e

never materializes H — each CG iteration gathers per-edge dof blocks,
multiplies through the stored (J, w*Omega) blocks, and scatter-adds, all
O(|E|) with MXU-friendly batched einsums. Preconditioner: block-Jacobi
(per-vertex 6x6 / 3x3 diagonal blocks, inverted in closed form).

This is the same edge-table layout as linearize.py, so the blocks come out
of the standard linearization pass and shard over a mesh exactly like
build_system (psum the matvec instead of H).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .linearize import _DOF, _edge_terms, _offsets
from .types import EDGE_SPECS, GraphData


class EdgeBlocks(NamedTuple):
    J1: jax.Array  # (E, d, dof1)
    J2: Optional[jax.Array]  # (E, d, dof2) or None
    wOmega: jax.Array  # (E, d, d) robust-weighted information
    rows1: jax.Array  # (E, dof1) global dof indices
    rows2: Optional[jax.Array]


class LinearizedSystem(NamedTuple):
    blocks: Dict[str, EdgeBlocks]
    b: jax.Array  # (D,) gradient  (J^T w Omega r)
    diag_blocks: jax.Array  # (D,) diagonal of H (for lambda scaling)
    chi2_robust: jax.Array


def linearize_blocks(data: GraphData) -> LinearizedSystem:
    """One linearization pass keeping per-edge blocks (no dense H)."""
    D = data.num_dof
    dtype = data.poses.dtype
    off = _offsets(data)
    b = jnp.zeros((D,), dtype)
    diag = jnp.zeros((D,), dtype)
    chi2_rob = jnp.zeros((), dtype)
    blocks: Dict[str, EdgeBlocks] = {}

    for etype, table in data.edges.items():
        if table.vi.shape[0] == 0:
            continue
        kinds, _, _ = EDGE_SPECS[etype]
        r, J1, J2, chi2, rho0, w = _edge_terms(etype, table, data)
        chi2_rob = chi2_rob + jnp.sum(rho0)
        wi = table.info * w[:, None, None]

        d1 = _DOF[kinds[0]]
        rows1 = off[kinds[0]] + d1 * table.vi[:, None] + jnp.arange(d1)[None, :]
        b = b.at[rows1].add(jnp.einsum("eia,eij,ej->ea", J1, wi, r))
        diag = diag.at[rows1].add(jnp.einsum("eia,eij,eja->ea", J1, wi, J1))

        rows2 = None
        if J2 is not None:
            d2 = _DOF[kinds[1]]
            rows2 = off[kinds[1]] + d2 * table.vj[:, None] + jnp.arange(d2)[None, :]
            b = b.at[rows2].add(jnp.einsum("eia,eij,ej->ea", J2, wi, r))
            diag = diag.at[rows2].add(jnp.einsum("eia,eij,eja->ea", J2, wi, J2))

        blocks[etype] = EdgeBlocks(J1=J1, J2=J2, wOmega=wi, rows1=rows1, rows2=rows2)

    return LinearizedSystem(blocks=blocks, b=b, diag_blocks=diag, chi2_robust=chi2_rob)


def hv(sys: LinearizedSystem, x: jax.Array, lam, free: jax.Array) -> jax.Array:
    """(H + lam I) x restricted to free dofs, matrix-free."""
    xf = x * free
    y = jnp.zeros_like(x)
    for blk in sys.blocks.values():
        x1 = xf[blk.rows1]  # (E, d1)
        u = jnp.einsum("eia,ea->ei", blk.J1, x1)
        if blk.J2 is not None:
            x2 = xf[blk.rows2]
            u = u + jnp.einsum("eia,ea->ei", blk.J2, x2)
        wu = jnp.einsum("eij,ej->ei", blk.wOmega, u)
        y = y.at[blk.rows1].add(jnp.einsum("eia,ei->ea", blk.J1, wu))
        if blk.J2 is not None:
            y = y.at[blk.rows2].add(jnp.einsum("eia,ei->ea", blk.J2, wu))
    return (y + lam * xf) * free


def solve_pcg(
    sys: LinearizedSystem,
    lam,
    free: jax.Array,
    max_cg_iters: int = 250,
    tol: float = 1e-8,
) -> jax.Array:
    """Solve (H + lam I) dx = -b over free dofs with Jacobi preconditioning."""
    dtype = sys.b.dtype
    freef = free.astype(dtype)
    b = -sys.b * freef
    # Jacobi preconditioner from the H diagonal (+ damping)
    Minv = freef / jnp.clip(sys.diag_blocks + lam, 1e-12, None)

    x0 = jnp.zeros_like(b)
    r0 = b  # x0 = 0 -> r = b - A x0 = b
    z0 = Minv * r0
    p0 = z0
    rz0 = jnp.dot(r0, z0)
    bnorm = jnp.linalg.norm(b)

    def cond(carry):
        x, r, z, p, rz, it = carry
        return (it < max_cg_iters) & (jnp.linalg.norm(r) > tol * jnp.maximum(bnorm, 1e-12))

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = hv(sys, p, lam, freef)
        denom = jnp.dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv * r
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, r, *_ = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, jnp.asarray(0, jnp.int32)))
    return x
