"""g2o Plane3D-compatible plane math in JAX.

Reproduces the exact minimal parameterization g2o uses for VertexPlane
(g2o/types/slam3d_addons/plane3d.h semantics), which the reference relies on
via EdgeSE3Plane (reference: include/g2o/edge_se3_plane.hpp:40-47) and the
floor constraint wiring (apps/hdl_graph_slam_nodelet.cpp:490-500).

A plane is stored as 4 coefficients (nx, ny, nz, c) with |n| = 1 after
normalization; g2o defines distance() = -c, so for plane equation
n.x + d = 0 the stored vector is exactly the RANSAC coeffs (n, d) and the
signed distance used in minimal coordinates is -d.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12

# Rotation-times-normal products are pose-manifold ops: pinned HIGHEST like
# core/se3.py (precision policy, package __init__ docstring).
_HIGHEST = jax.lax.Precision.HIGHEST


def normalize(coeffs):
    """Scale so the normal has unit length (g2o Plane3D::normalize)."""
    n = jnp.linalg.norm(coeffs[..., :3], axis=-1, keepdims=True)
    return coeffs / jnp.clip(n, _EPS, None)


def normal(coeffs):
    return coeffs[..., :3]


def distance(coeffs):
    """g2o Plane3D::distance() == -coeffs[3]."""
    return -coeffs[..., 3]


def azimuth(v):
    return jnp.arctan2(v[..., 1], v[..., 0])


def elevation(v):
    return jnp.arctan2(v[..., 2], jnp.linalg.norm(v[..., :2], axis=-1))


def rotation_of_normal(v):
    """g2o Plane3D::rotation(v): Rz(azimuth) * Ry(-elevation).

    Maps the x-axis onto the (normalized) direction v.
    """
    az = azimuth(v)
    el = elevation(v)
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se = jnp.cos(el), jnp.sin(el)
    # Rz(az) @ Ry(-el)
    row0 = jnp.stack([ca * ce, -sa, -ca * se], axis=-1)
    row1 = jnp.stack([sa * ce, ca, -sa * se], axis=-1)
    row2 = jnp.stack([se, jnp.zeros_like(ca), ce], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def ominus(coeffs_self, coeffs_other):
    """g2o Plane3D::ominus(other): minimal 3-dof difference.

    R = rotation(self.normal)^T; n = R @ other.normal;
    returns [azimuth(n), elevation(n), self.distance - other.distance].
    """
    R = jnp.swapaxes(rotation_of_normal(normal(coeffs_self)), -1, -2)
    n = jnp.einsum("...ij,...j->...i", R, normal(coeffs_other), precision=_HIGHEST)
    d = distance(coeffs_self) - distance(coeffs_other)
    return jnp.stack([azimuth(n), elevation(n), d], axis=-1)


def ominus_safe(coeffs_self, coeffs_other):
    """Pole-safe variant of ominus with identical chi2 and first-order
    behavior.

    g2o's ominus builds the frame from *self*'s normal, whose azimuth/
    elevation parameterization has a derivative singularity when the normal
    is exactly +-z — precisely the floor-plane case (EdgeSE3Plane wiring,
    hdl_graph_slam_nodelet.cpp:490-500). Under autodiff that produces NaN
    Jacobians. Here the frame comes from *other* (the measurement — constant
    under differentiation), and the azimuth/elevation are taken of
    R(n_other)^T n_self, a vector near +x where atan2 is smooth. For
    self = other + eps this equals g2o's error to O(|eps|^2) up to the
    (information-invariant) sign convention, and the zero set is identical.
    """
    R = jnp.swapaxes(rotation_of_normal(normal(coeffs_other)), -1, -2)
    u = jnp.einsum("...ij,...j->...i", R, normal(coeffs_self), precision=_HIGHEST)
    d = distance(coeffs_self) - distance(coeffs_other)
    return jnp.stack([-azimuth(u), -elevation_from_x(u), d], axis=-1)


def elevation_from_x(v):
    """Elevation of a vector known to be near +x: atan2(z, |xy|) — smooth
    there (|xy| ~ 1)."""
    return jnp.arctan2(v[..., 2], jnp.linalg.norm(v[..., :2], axis=-1))


def oplus(coeffs, v):
    """g2o Plane3D::oplus(v): minimal update [d_azimuth, d_elevation, d_dist].

    Constructs a unit direction from the increment's azimuth/elevation,
    rotates it by rotation(self.normal), bumps the distance, renormalizes.
    """
    az = v[..., 0]
    el = v[..., 1]
    ce, se = jnp.cos(el), jnp.sin(el)
    n_local = jnp.stack([ce * jnp.cos(az), ce * jnp.sin(az), se], axis=-1)
    R = rotation_of_normal(normal(coeffs))
    n_new = jnp.einsum("...ij,...j->...i", R, n_local, precision=_HIGHEST)
    d_new = distance(coeffs) + v[..., 2]
    out = jnp.concatenate([n_new, -d_new[..., None]], axis=-1)
    return normalize(out)


def transform(T, coeffs):
    """g2o operator*(Isometry3, Plane3D): rotate normal, shift offset.

    v2.head<3> = R v.head<3>; v2[3] = v[3] - t . v2.head<3>; renormalize.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    n2 = jnp.einsum("...ij,...j->...i", R, coeffs[..., :3], precision=_HIGHEST)
    c2 = coeffs[..., 3] - jnp.einsum("...i,...i->...", t, n2, precision=_HIGHEST)
    return normalize(jnp.concatenate([n2, c2[..., None]], axis=-1))
