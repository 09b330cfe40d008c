"""Batched linearization of all edge tables into a dense (H, b) system.

Per edge type: vmapped residual + manifold Jacobians (jax.jacfwd of the
residual through each vertex's local increment at zero — the numeric
equivalent of g2o's numeric linearizeOplus for the custom edges), robust
reweighting (rho1 scaling of H and b, g2o first-order robustification),
then scatter-add of the dof-blocks into the global system.

State layout: [poses: 6 dof each | planes: 3 | points: 3].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import plane as planelib
from ..core import se3
from . import edges as E
from .robust import rho_and_weight
from .types import EDGE_SPECS, EdgeTable, GraphData

# residual dispatch: fn(V1, V2_or_None, meas) -> r
_RES = {
    "se3_se3": lambda a, b, m: E.se3_se3(a, b, m),
    "se3_plane": lambda a, b, m: E.se3_plane(a, b, m),
    "se3_prior_xy": lambda a, b, m: E.se3_prior_xy(a, m),
    "se3_prior_xyz": lambda a, b, m: E.se3_prior_xyz(a, m),
    "se3_prior_vec": lambda a, b, m: E.se3_prior_vec(a, m),
    "se3_prior_quat": lambda a, b, m: E.se3_prior_quat(a, m),
    "plane_prior_normal": lambda a, b, m: E.plane_prior_normal(a, m),
    "plane_prior_distance": lambda a, b, m: E.plane_prior_distance(a, m),
    "plane_identity": lambda a, b, m: E.plane_identity(a, b, m),
    "plane_parallel": lambda a, b, m: E.plane_parallel(a, b, m),
    "plane_perpendicular": lambda a, b, m: E.plane_perpendicular(a, b),
    "se3_point_xyz": lambda a, b, m: E.se3_point_xyz(a, b, m),
}


def _get_vertex(kind: str, data: GraphData, idx):
    if kind == "pose":
        return data.poses[idx]
    if kind == "plane":
        return data.planes[idx]
    return data.points[idx]


def _oplus(kind: str, value, delta):
    if kind == "pose":
        return se3.se3_oplus(value, delta)
    if kind == "plane":
        return planelib.oplus(value, delta)
    return value + delta


def _offsets(data: GraphData) -> Dict[str, int]:
    np_ = data.poses.shape[0]
    nl = data.planes.shape[0]
    return {"pose": 0, "plane": 6 * np_, "point": 6 * np_ + 3 * nl}


_DOF = {"pose": 6, "plane": 3, "point": 3}


def _edge_terms(etype: str, table: EdgeTable, data: GraphData):
    """Vmapped residual/Jacobian blocks for one edge table.

    Returns r (E,d), J1 (E,d,dof1), J2 (E,d,dof2) or None, chi2 (E,),
    rho0 (E,), w (E,) with padding-edge weights zeroed.
    """
    kinds, _, rdim = EDGE_SPECS[etype]
    rfn = _RES[etype]
    unary = len(kinds) == 1
    dtype = data.poses.dtype

    if unary:

        def one(vi, meas):
            V1 = _get_vertex(kinds[0], data, vi)

            def r_of(d1):
                return rfn(_oplus(kinds[0], V1, d1), None, meas)

            z1 = jnp.zeros(_DOF[kinds[0]], dtype)
            return r_of(z1), jax.jacfwd(r_of)(z1)

        r, J1 = jax.vmap(one)(table.vi, table.meas)
        J2 = None
    else:

        def one(vi, vj, meas):
            V1 = _get_vertex(kinds[0], data, vi)
            V2 = _get_vertex(kinds[1], data, vj)

            def r_of(d1, d2):
                return rfn(_oplus(kinds[0], V1, d1), _oplus(kinds[1], V2, d2), meas)

            z1 = jnp.zeros(_DOF[kinds[0]], dtype)
            z2 = jnp.zeros(_DOF[kinds[1]], dtype)
            return (
                r_of(z1, z2),
                jax.jacfwd(r_of, argnums=0)(z1, z2),
                jax.jacfwd(r_of, argnums=1)(z1, z2),
            )

        r, J1, J2 = jax.vmap(one)(table.vi, table.vj, table.meas)

    chi2 = jnp.einsum("ei,eij,ej->e", r, table.info, r)
    rho0, w = rho_and_weight(chi2, table.kernel_id, table.kernel_delta)
    wm = jnp.where(table.mask, w, 0.0)
    rho0 = jnp.where(table.mask, rho0, 0.0)
    chi2 = jnp.where(table.mask, chi2, 0.0)
    return r, J1, J2, chi2, rho0, wm


def build_system(data: GraphData, axis_name=None) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Assemble dense H, b over all edge tables.

    Returns (H, b, chi2_raw, chi2_robust) where b = sum w J^T info r (the
    gradient half; solve (H + lam I) dx = -b).

    With ``axis_name`` (inside shard_map over edge-sharded tables) the
    partial systems are psum-reduced over the mesh axis — the distributed
    Hessian assembly of BASELINE.json's north star.
    """
    D = data.num_dof
    dtype = data.poses.dtype
    H = jnp.zeros((D, D), dtype)
    b = jnp.zeros((D,), dtype)
    chi2_raw = jnp.zeros((), dtype)
    chi2_rob = jnp.zeros((), dtype)
    off = _offsets(data)

    for etype, table in data.edges.items():
        if table.vi.shape[0] == 0:
            continue
        kinds, _, rdim = EDGE_SPECS[etype]
        r, J1, J2, chi2, rho0, w = _edge_terms(etype, table, data)
        chi2_raw = chi2_raw + jnp.sum(chi2)
        chi2_rob = chi2_rob + jnp.sum(rho0)

        wi = table.info * w[:, None, None]
        d1 = _DOF[kinds[0]]
        rows1 = off[kinds[0]] + d1 * table.vi[:, None] + jnp.arange(d1)[None, :]
        H11 = jnp.einsum("eia,eij,ejb->eab", J1, wi, J1)
        H = H.at[rows1[:, :, None], rows1[:, None, :]].add(H11)
        b1 = jnp.einsum("eia,eij,ej->ea", J1, wi, r)
        b = b.at[rows1].add(b1)

        if J2 is not None:
            d2 = _DOF[kinds[1]]
            rows2 = off[kinds[1]] + d2 * table.vj[:, None] + jnp.arange(d2)[None, :]
            H22 = jnp.einsum("eia,eij,ejb->eab", J2, wi, J2)
            H = H.at[rows2[:, :, None], rows2[:, None, :]].add(H22)
            H12 = jnp.einsum("eia,eij,ejb->eab", J1, wi, J2)
            H = H.at[rows1[:, :, None], rows2[:, None, :]].add(H12)
            H = H.at[rows2[:, :, None], rows1[:, None, :]].add(jnp.swapaxes(H12, 1, 2))
            b2 = jnp.einsum("eia,eij,ej->ea", J2, wi, r)
            b = b.at[rows2].add(b2)

    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)
        chi2_raw = jax.lax.psum(chi2_raw, axis_name)
        chi2_rob = jax.lax.psum(chi2_rob, axis_name)
    return H, b, chi2_raw, chi2_rob


def chi2_only(data: GraphData, axis_name=None) -> Tuple[jax.Array, jax.Array]:
    """Raw and robustified total chi2 without Jacobians (LM trial scoring)."""
    dtype = data.poses.dtype
    chi2_raw = jnp.zeros((), dtype)
    chi2_rob = jnp.zeros((), dtype)
    for etype, table in data.edges.items():
        if table.vi.shape[0] == 0:
            continue
        kinds, _, _ = EDGE_SPECS[etype]
        rfn = _RES[etype]
        if len(kinds) == 1:
            r = jax.vmap(lambda vi, m: rfn(_get_vertex(kinds[0], data, vi), None, m))(table.vi, table.meas)
        else:
            r = jax.vmap(
                lambda vi, vj, m: rfn(_get_vertex(kinds[0], data, vi), _get_vertex(kinds[1], data, vj), m)
            )(table.vi, table.vj, table.meas)
        chi2 = jnp.einsum("ei,eij,ej->e", r, table.info, r)
        rho0, _ = rho_and_weight(chi2, table.kernel_id, table.kernel_delta)
        chi2_raw = chi2_raw + jnp.sum(jnp.where(table.mask, chi2, 0.0))
        chi2_rob = chi2_rob + jnp.sum(jnp.where(table.mask, rho0, 0.0))
    if axis_name is not None:
        chi2_raw = jax.lax.psum(chi2_raw, axis_name)
        chi2_rob = jax.lax.psum(chi2_rob, axis_name)
    return chi2_raw, chi2_rob


def free_dof_mask(data: GraphData) -> jax.Array:
    """(D,) bool — dofs that participate in the solve (allocated, not fixed)."""
    pf = data.pose_mask & jnp.logical_not(data.pose_fixed)
    lf = data.plane_mask & jnp.logical_not(data.plane_fixed)
    mf = data.point_mask & jnp.logical_not(data.point_fixed)
    return jnp.concatenate(
        [
            jnp.repeat(pf, 6),
            jnp.repeat(lf, 3),
            jnp.repeat(mf, 3),
        ]
    )


def apply_delta(data: GraphData, dx: jax.Array) -> GraphData:
    """Manifold update of all vertices by the (masked) solution vector."""
    np_ = data.poses.shape[0]
    nl = data.planes.shape[0]
    nm = data.points.shape[0]
    free = free_dof_mask(data)
    dx = jnp.where(free, dx, 0.0)
    dp = dx[: 6 * np_].reshape(np_, 6)
    dl = dx[6 * np_ : 6 * np_ + 3 * nl].reshape(nl, 3)
    dm = dx[6 * np_ + 3 * nl :].reshape(nm, 3)
    poses = jax.vmap(se3.se3_oplus)(data.poses, dp)
    planes = jax.vmap(planelib.oplus)(data.planes, dl)
    points = data.points + dm
    return GraphData(
        poses=poses,
        pose_fixed=data.pose_fixed,
        pose_mask=data.pose_mask,
        planes=planes,
        plane_fixed=data.plane_fixed,
        plane_mask=data.plane_mask,
        points=points,
        point_fixed=data.point_fixed,
        point_mask=data.point_mask,
        edges=data.edges,
    )
