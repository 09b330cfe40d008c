import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from hdl_graph_slam_tpu.core import se3


def random_rot(rng):
    w = rng.standard_normal(3)
    return np.asarray(se3.so3_exp(jnp.asarray(w)))


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for scale in [1e-6, 1e-3, 0.5, 1.5, 3.0]:
        w = rng.standard_normal(3)
        w = w / np.linalg.norm(w) * scale
        R = se3.so3_exp(jnp.asarray(w))
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-6)


def test_so3_log_near_pi_mixed_sign_axis():
    """At/near theta=pi the vee differences vanish; mixed-sign axes (e.g.
    (1,-1,0)/sqrt2) must still round-trip (signs recovered from off-diagonal
    sums, core/se3.py so3_log near-pi branch)."""
    axes = [
        np.array([1.0, -1.0, 0.0]),
        np.array([-1.0, 1.0, 1.0]),
        np.array([0.0, 1.0, -1.0]),
        np.array([1.0, -0.3, 0.8]),
        np.array([0.0, 0.0, -1.0]),
    ]
    for a in axes:
        a = a / np.linalg.norm(a)
        for theta in [np.pi, np.pi - 1e-7, np.pi - 1e-5, np.pi - 5e-5]:
            R = se3.so3_exp(jnp.asarray(a * theta))
            w = np.asarray(se3.so3_log(R))
            R2 = np.asarray(se3.so3_exp(jnp.asarray(w)))
            # the log itself is only defined up to sign at exactly pi;
            # the rotation it encodes must match
            np.testing.assert_allclose(R2, np.asarray(R), atol=1e-6)


def test_so3_exp_is_rotation():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 3)))
    R = se3.so3_exp(w)
    eye = jnp.eye(3)
    err = jnp.max(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye))
    assert float(err) < 1e-6
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(np.asarray(det), 1.0, atol=1e-6)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = rng.standard_normal((16, 6))
    # keep rotation magnitude within (0, pi) where log is the exact inverse
    wn = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] *= 2.8 / np.maximum(wn, 2.8 / 0.9)
    xi = jnp.asarray(xi)
    T = se3.se3_exp(xi)
    xi2 = se3.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)


def test_inverse_compose():
    rng = np.random.default_rng(3)
    xi = jnp.asarray(rng.standard_normal(6))
    T = se3.se3_exp(xi)
    eye = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(eye), np.eye(4), atol=1e-6)


def test_quat_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(20):
        w = rng.standard_normal(3) * 2.0
        R = se3.so3_exp(jnp.asarray(w))
        q = se3.quat_from_mat(R)
        R2 = se3.mat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)


def test_quat_near_pi():
    # rotation of pi about z: trace = -1, exercises non-w branches
    R = jnp.asarray(np.diag([-1.0, -1.0, 1.0]))
    q = se3.quat_from_mat(R)
    R2 = se3.mat_from_quat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)


def test_mqt_roundtrip():
    rng = np.random.default_rng(5)
    delta = jnp.asarray(rng.standard_normal(6) * 0.3)
    T = se3.mqt_exp(delta)
    d2 = se3.mqt_log(T)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(delta), atol=1e-6)


def test_mqt_exp_matches_quaternion_semantics():
    # for pure translation the MQT increment is exact
    delta = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    T = se3.mqt_exp(delta)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), [1, 2, 3], atol=1e-12)
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-12)


def test_transform_points():
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.standard_normal((100, 3)))
    T = se3.se3_exp(jnp.asarray(rng.standard_normal(6)))
    out = se3.transform_points(T, pts)
    expected = pts @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_rotation_angle():
    w = jnp.asarray([0.0, 0.0, 0.7])
    R = se3.so3_exp(w)
    assert abs(float(se3.rotation_angle(R)) - 0.7) < 1e-6


def test_jit_and_vmap():
    rng = np.random.default_rng(7)
    xi = jnp.asarray(rng.standard_normal((8, 6)))
    T = jax.jit(jax.vmap(se3.se3_exp))(xi)
    assert T.shape == (8, 4, 4)
    back = jax.jit(jax.vmap(se3.se3_log))(T)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-6)


def test_matmul_precision_default_is_high():
    """The package import must set jax_default_matmul_precision='high'
    unless the user set one: at the TPU MXU's bf16 DEFAULT a single 4x4
    pose product perturbs det(R) to 1.0055 and the odometry rotation chain
    silently leaves SO(3) (round-4 post-mortem, PERF.md; pose ops pin
    HIGHEST separately). A fresh subprocess checks the import-time behavior
    without this process's already-configured state."""
    import subprocess
    import sys

    code = (
        "import os, sys; sys.path.insert(0, os.getcwd());"
        "import jax;"
        "assert jax.config.jax_default_matmul_precision is None;"
        "import hdl_graph_slam_tpu;"
        "assert jax.config.jax_default_matmul_precision == 'high';"
        # an explicit user setting must be respected — use a value DISTINCT
        # from the package default so an unconditional overwrite would fail
        "jax.config.update('jax_default_matmul_precision', 'bfloat16');"
        "import importlib; importlib.reload(hdl_graph_slam_tpu);"
        "assert jax.config.jax_default_matmul_precision == 'bfloat16';"
        "print('ok')"
    )
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), env=env)
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_compose_and_transform_points_pin_highest_precision():
    """se3.compose/transform_points must stay exact even if the global flag
    is lowered (library users may run with fast matmuls for their own code)."""
    import jax

    th = 0.0524  # ~3 deg: cos rounds by 2^-8 in bf16
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    with jax.default_matmul_precision("bfloat16"):
        out = np.asarray(se3.compose(jnp.asarray(T), jnp.asarray(T)))
        moved = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray([[50.0, 0.0, 0.0]], np.float32)))
    ref = T.astype(np.float64) @ T.astype(np.float64)
    assert np.abs(out - ref).max() < 1e-6
    assert abs(np.linalg.det(out[:3, :3]) - 1.0) < 1e-6
    ref_mv = np.array([[50.0, 0.0, 0.0]]) @ R.astype(np.float64).T
    assert np.abs(moved - ref_mv).max() < 1e-5


def test_pose_ops_pin_highest_structurally():
    """CPU executes every precision identically, so the numeric test above
    can't catch a lost precision= pin. Assert the pin STRUCTURALLY: under a
    bfloat16 global default, the traced jaxprs of se3.compose /
    transform_points / se3_oplus and of the graph se3_se3 residual must
    carry Precision.HIGHEST on their dot_generals (ADVICE r4)."""
    import jax

    from hdl_graph_slam_tpu.graph import edges as E

    def dot_precisions(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        out = []

        def walk(jp):
            for eqn in jp.eqns:
                if eqn.primitive.name == "dot_general":
                    out.append(eqn.params.get("precision"))
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        walk(v.jaxpr)

        walk(jaxpr.jaxpr)
        return out

    T = jnp.eye(4, dtype=jnp.float32)
    pts = jnp.zeros((8, 3), jnp.float32)
    d = jnp.zeros(6, jnp.float32)
    H = jax.lax.Precision.HIGHEST
    with jax.default_matmul_precision("bfloat16"):
        for fn, args in [
            (se3.compose, (T, T)),
            (se3.transform_points, (T, pts)),
            (se3.se3_oplus, (T, d)),
            (E.se3_se3, (T, T, T)),
        ]:
            precs = dot_precisions(fn, *args)
            assert precs, f"{fn.__name__}: no dot_general found"
            assert all(p == (H, H) for p in precs), f"{fn.__name__}: {precs}"
