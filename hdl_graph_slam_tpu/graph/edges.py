"""Residual functions for every edge type in the reference's graph.

Each function maps (vertex estimates..., measurement) -> residual vector and
reproduces the corresponding g2o computeError bit-for-bit in behavior
(SURVEY.md §2.3). Sign-flip branches become jnp.where so everything vmaps.

Vertex conventions:
- SE3 vertex: 4x4 matrix; local increment = g2o MQT (se3.se3_oplus).
- Plane vertex: 4 coeffs (n, c), distance = -c; local increment =
  plane.oplus (azimuth/elevation/distance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import plane as planelib
from ..core import se3


def se3_se3(T1, T2, meas):
    """g2o stock EdgeSE3 (types/slam3d/edge_se3.cpp): error =
    toVectorMQT(meas^-1 * T1^-1 * T2). Wired by add_se3_edge with
    meas = curr.odom^-1 * prev.odom, vertices (curr, prev)
    (apps/hdl_graph_slam_nodelet.cpp:234-236, 568-570).

    The residual chain composes at HIGHEST precision (se3.compose): this is
    the exact phantom-chi2 site of the round-4 bf16 post-mortem — a bf16
    product inside the residual would reintroduce the failure mode even
    with orthogonal inputs (rotation rows carry ~25x the translation
    information weight), and the SO(3) ingest projection only guards the
    measurements, not the product."""
    delta = se3.compose(se3.inverse(meas), se3.compose(se3.inverse(T1), T2))
    return se3.mqt_log(delta)


def se3_plane(T, plane_coeffs, meas_coeffs):
    """EdgeSE3Plane (include/g2o/edge_se3_plane.hpp:40-47):
    ((T)^-1 * plane_w).ominus(measured local plane).

    Uses the pole-safe ominus variant (plane.ominus_safe): identical zero
    set and chi2, finite autodiff Jacobians at vertical normals — the
    floor-plane configuration this edge exists for."""
    local = planelib.transform(se3.inverse(T), plane_coeffs)
    return planelib.ominus_safe(local, meas_coeffs)


def se3_prior_xy(T, meas_xy):
    """EdgeSE3PriorXY (edge_se3_priorxy.hpp:39-44): t.xy - meas."""
    return T[:2, 3] - meas_xy


def se3_prior_xyz(T, meas_xyz):
    """EdgeSE3PriorXYZ (edge_se3_priorxyz.hpp:39-44): t - meas."""
    return T[:3, 3] - meas_xyz


def se3_prior_vec(T, meas6):
    """EdgeSE3PriorVec (edge_se3_priorvec.hpp:39-53): R^-1 * direction -
    measurement. meas6 = [direction(3), measurement(3)], both normalized at
    set time (setMeasurement normalizes; we expect pre-normalized input).
    Wired with direction=-z, measurement=IMU acceleration
    (hdl_graph_slam_nodelet.cpp:441)."""
    direction = meas6[:3]
    measurement = meas6[3:]
    est = jnp.matmul(T[:3, :3].T, direction, precision=jax.lax.Precision.HIGHEST)
    return est - measurement


def se3_prior_quat(T, meas_q_wxyz):
    """EdgeSE3PriorQuat (edge_se3_priorquat.hpp:39-48): sign-align estimate
    quaternion to the measurement, error = est.vec - meas.vec."""
    q = se3.quat_from_mat(T[:3, :3])
    dot = jnp.dot(q, meas_q_wxyz)
    q = jnp.where(dot < 0.0, -q, q)
    return q[1:] - meas_q_wxyz[1:]


def plane_prior_normal(plane_coeffs, meas_n):
    """EdgePlanePriorNormal (edge_plane_prior.hpp:40-49): sign-aligned
    normal - measured normal."""
    n = planelib.normal(plane_coeffs)
    n = jnp.where(jnp.dot(n, meas_n) < 0.0, -n, n)
    return n - meas_n


def plane_prior_distance(plane_coeffs, meas_d):
    """EdgePlanePriorDistance (edge_plane_prior.hpp:80-83):
    meas - plane.distance()."""
    return (meas_d - planelib.distance(plane_coeffs))[None]


def plane_identity(p1, p2, meas4):
    """EdgePlaneIdentity (edge_plane_identity.hpp:47-59): flip p2 if
    opposing, error = (p2 - p1) - meas on raw 4-vectors."""
    flip = jnp.dot(p1, p2) < 0.0
    p2 = jnp.where(flip, -p2, p2)
    return (p2 - p1) - meas4


def plane_parallel(p1, p2, meas3):
    """EdgePlaneParallel (edge_plane_parallel.hpp:44-56): sign-aligned
    normal difference minus measurement."""
    n1 = planelib.normal(p1)
    n2 = planelib.normal(p2)
    n2 = jnp.where(jnp.dot(n1, n2) < 0.0, -n2, n2)
    return (n2 - n1) - meas3


def plane_perpendicular(p1, p2):
    """EdgePlanePerpendicular (edge_plane_parallel.hpp:106-114):
    normalized n1 . normalized n2 (1-dof; measurement unused in the error)."""
    n1 = planelib.normal(p1)
    n2 = planelib.normal(p2)
    n1 = n1 / jnp.linalg.norm(n1)
    n2 = n2 / jnp.linalg.norm(n2)
    return jnp.dot(n1, n2)[None]


def se3_point_xyz(T, point, meas3):
    """g2o stock EdgeSE3PointXYZ (types/slam3d/edge_se3_pointxyz.cpp, without
    the sensor-offset parameter, which the reference never sets — graph_slam
    add_se3_point_xyz_edge uses offset id 0 = identity): error =
    T^-1 * point - meas."""
    local = jnp.matmul(T[:3, :3].T, point - T[:3, 3], precision=jax.lax.Precision.HIGHEST)
    return local - meas3
