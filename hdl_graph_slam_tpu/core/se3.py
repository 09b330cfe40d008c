"""SE(3)/SO(3) manifold operations, JAX-native and jit/vmap-friendly.

Conventions follow g2o's `slam3d` types so the pose-graph solver reproduces
the reference's behavior (reference: include/g2o/* custom edges and
src/hdl_graph_slam/graph_slam.cpp which build on g2o VertexSE3/EdgeSE3):

- Poses are 4x4 homogeneous matrices (row-major logical layout).
- The minimal 6-dof increment is ``[dx dy dz qx qy qz]`` (translation then the
  vector part of a unit quaternion, w recovered as sqrt(1-|v|^2)) exactly like
  g2o's ``internal::fromVectorMQT`` / ``toVectorMQT``, applied by *right*
  multiplication: ``T <- T * mqt_exp(delta)`` (g2o VertexSE3::oplusImpl).

All functions work in whatever dtype the inputs carry (f32 on TPU, f64 in
CPU tests with jax_enable_x64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12

# Every matmul/einsum in this module is pinned to HIGHEST precision: these
# are pose-manifold products (precision policy, package __init__ docstring)
# and must stay true f32 even under a user-lowered global matmul precision.
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def make(R, t):
    """Build a 4x4 SE(3) matrix from a 3x3 rotation and 3-translation."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    T = jnp.zeros((4, 4), dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    T = T.at[3, 3].set(1.0)
    return T


def rotation(T):
    return T[..., :3, :3]


def translation(T):
    return T[..., :3, 3]


def inverse(T):
    """Inverse of an SE(3) matrix (batched ok)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t, precision=_HIGHEST)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def compose(A, B):
    """SE(3) product at HIGHEST matmul precision.

    Pose composition must be true f32 regardless of the process-global
    matmul-precision flag: at the TPU MXU's bf16 DEFAULT a single 4x4
    product perturbs the rotation block by up to 2^-8 (det 1.0055 measured),
    and odometry composes hundreds of these — see the package __init__
    docstring for the full round-4 post-mortem."""
    return jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST)


def transform_points(T, pts):
    """Apply SE(3) to points of shape (..., 3). HIGHEST-precision matmul:
    at the MXU's bf16 DEFAULT this moved 50 m points by ~7 cm."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.matmul(
        pts, jnp.swapaxes(R, -1, -2), precision=jax.lax.Precision.HIGHEST
    ) + t[..., None, :]


def hat(w):
    """so(3) hat operator: (...,3) -> (...,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w):
    """Rodrigues formula with Taylor fallback near zero. (...,3)->(...,3,3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    # derivative-safe branch selection: clamp the argument of the "generic"
    # branch away from 0 so its (higher-order) derivatives stay finite even
    # though the series branch is selected there.
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * _mm(W, W)


def so3_log(R):
    """Log map of SO(3): (...,3,3)->(...,3). Safe near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-4
    # generic: theta / (2 sin theta) * v
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / (2.0 * jnp.where(jnp.abs(sin_theta) < _EPS, 1.0, sin_theta)),
    )
    w_generic = scale[..., None] * v
    # near pi: magnitudes from the diagonal extraction
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # Relative signs from the off-diagonal *sums* R[i,j]+R[j,i] =
    # 2 a_i a_j (1-cos), which stay O(1) at theta == pi (the vee differences
    # vanish there and would scramble mixed-sign axes). Anchor on the
    # largest-magnitude axis component; its absolute sign comes from the
    # vee part v = 2 sin(theta) a (continuity just below pi; at exactly pi
    # +a and -a are equivalent so sign(0)->+ is fine).
    eye3 = jnp.eye(3, dtype=R.dtype)
    P = (R + jnp.swapaxes(R, -1, -2)) * (1.0 - eye3) + eye3  # P[i,j] ~ a_i a_j, P[i,i] > 0
    k = jnp.argmax(axis, axis=-1)
    k_onehot = (jnp.arange(3) == k[..., None]).astype(R.dtype)
    anchor_col = jnp.einsum("...ij,...j->...i", P, k_onehot)
    rel_sign = jnp.where(anchor_col < 0, -1.0, 1.0)  # sign(a_i) relative to sign(a_k)=+1
    v_anchor = jnp.take_along_axis(v, k[..., None], axis=-1)[..., 0]
    overall = jnp.where(v_anchor < 0, -1.0, 1.0)
    axis = axis * rel_sign * overall[..., None]
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def se3_exp(xi):
    """Exponential map of se(3) twist [v, w] (...,6) -> (...,4,4)."""
    v = xi[..., :3]
    w = xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * _mm(W, W)
    V = eye + B[..., None, None] * W + C[..., None, None] * _mm(W, W)
    t = jnp.einsum("...ij,...j->...i", V, v, precision=_HIGHEST)
    out = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def se3_log(T):
    """Log map of SE(3): (...,4,4) -> (...,6) twist [v, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / theta2_safe)
    Vinv = eye - 0.5 * W + coef[..., None, None] * _mm(W, W)
    v = jnp.einsum("...ij,...j->...i", Vinv, t, precision=_HIGHEST)
    return jnp.concatenate([v, w], axis=-1)


# ---------------------------------------------------------------------------
# Quaternion utilities (w-last internally named explicitly to avoid confusion)
# ---------------------------------------------------------------------------


def quat_from_mat(R):
    """Rotation matrix -> quaternion (w, x, y, z), w >= 0 not enforced.

    Branch-free Shepperd's method (works batched under jit).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate solutions
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    s0 = 0.25 / qw0
    c0 = jnp.stack([qw0, (m21 - m12) * s0, (m02 - m20) * s0, (m10 - m01) * s0], axis=-1)

    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    s1 = 0.25 / qx1
    c1 = jnp.stack([(m21 - m12) * s1, qx1, (m01 + m10) * s1, (m02 + m20) * s1], axis=-1)

    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    s2 = 0.25 / qy2
    c2 = jnp.stack([(m02 - m20) * s2, (m01 + m10) * s2, qy2, (m12 + m21) * s2], axis=-1)

    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    s3 = 0.25 / qz3
    c3 = jnp.stack([(m10 - m01) * s3, (m02 + m20) * s3, (m12 + m21) * s3, qz3], axis=-1)

    # choose the numerically best branch
    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        c0,
        jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mat_from_quat(q):
    """Quaternion (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rotation_angle(R):
    """The rotation angle of a rotation matrix (used for keyframe gating,
    reference: keyframe_updater.hpp:46 AngleAxisd(delta.linear()).angle())."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def acos_qw_angle(R):
    """acos(q.w) angle measure used by the reference odometry thresholds
    (scan_matching_odometry_nodelet.cpp:229,244: acos(Quaternionf(delta).w())).
    Equals half the true rotation angle."""
    q = quat_from_mat(R)
    return jnp.arccos(jnp.clip(jnp.abs(q[..., 0]) * 0.0 + q[..., 0], -1.0, 1.0))


# ---------------------------------------------------------------------------
# g2o MQT minimal parameterization (translation + quaternion vector part)
# ---------------------------------------------------------------------------


def mqt_exp(delta):
    """g2o internal::fromVectorMQT: [t(3), qvec(3)] -> SE(3).

    w = sqrt(max(0, 1 - |qvec|^2)); if |qvec| > 1 the quaternion is normalized
    (g2o normalizes; the >1 case only occurs for large updates).
    """
    t = delta[..., :3]
    v = delta[..., 3:]
    n2 = jnp.sum(v * v, axis=-1)
    over = n2 > 1.0
    w = jnp.sqrt(jnp.clip(1.0 - n2, 0.0, None))
    q = jnp.concatenate([w[..., None], v], axis=-1)
    qn = jnp.concatenate([jnp.zeros_like(w[..., None]), v / jnp.sqrt(n2 + _EPS)[..., None]], axis=-1)
    q = jnp.where(over[..., None], qn, q)
    R = mat_from_quat(q)
    out = jnp.zeros(delta.shape[:-1] + (4, 4), dtype=delta.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def mqt_log(T):
    """g2o internal::toVectorMQT: SE(3) -> [t(3), qvec(3)] with q.w >= 0."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    q = quat_from_mat(R)
    sign = jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    return jnp.concatenate([t, sign * q[..., 1:]], axis=-1)


def se3_oplus(T, delta):
    """g2o VertexSE3 oplus: right-multiply by the MQT increment
    (HIGHEST-precision product — pose updates must stay on SE(3))."""
    return compose(T, mqt_exp(delta))


def project_so3(T, steps: int = 1):
    """Pull the rotation block of an SE(3) matrix back onto SO(3) with
    Newton-Schulz polar iterations: R <- R(1.5 I - 0.5 R^T R). Quadratic
    near orthogonality (one step: 1e-3 error -> ~1e-6; the f32 fixed point
    is ~1e-7). Used by the device odometry step so per-frame rotation error
    (e.g. ICP's f32 Procrustes, ~5e-7/frame) cannot ACCUMULATE linearly
    along a multi-hundred-frame pose chain — same defense-in-depth as the
    backend's SVD polar projection at graph ingest (backend/slam.py)."""
    R = T[..., :3, :3]
    eye = jnp.eye(3, dtype=T.dtype)
    for _ in range(steps):
        RtR = _mm(jnp.swapaxes(R, -1, -2), R)
        R = _mm(R, 1.5 * eye - 0.5 * RtR)
    return T.at[..., :3, :3].set(R)
