import jax.numpy as jnp
import numpy as np

from hdl_graph_slam_tpu.core import plane, se3


def test_normalize():
    c = jnp.asarray([0.0, 0.0, 2.0, 4.0])
    n = plane.normalize(c)
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1, 2], atol=1e-12)


def test_distance_sign_convention():
    # g2o: distance() == -coeffs[3]
    c = jnp.asarray([0.0, 0.0, 1.0, -1.5])
    assert abs(float(plane.distance(c)) - 1.5) < 1e-12


def test_rotation_of_normal_maps_x_axis():
    rng = np.random.default_rng(0)
    for _ in range(10):
        v = rng.standard_normal(3)
        v = v / np.linalg.norm(v)
        R = plane.rotation_of_normal(jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(R[:, 0]), v, atol=1e-9)
        # is a rotation
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-9)


def test_ominus_zero_for_identical():
    c = plane.normalize(jnp.asarray([0.3, -0.4, 0.86, 1.2]))
    err = plane.ominus(c, c)
    np.testing.assert_allclose(np.asarray(err), np.zeros(3), atol=1e-9)


def test_oplus_ominus_consistency():
    # g2o convention: ominus(p.oplus(v), p) ~= (-v0, -v1, +v2) to first order
    # (azimuth/elevation flip sign because ominus rotates into the *new*
    # plane's frame; the distance term is direct).
    rng = np.random.default_rng(1)
    c = plane.normalize(jnp.asarray([0.1, 0.2, 0.97, -0.5]))
    v = jnp.asarray(rng.standard_normal(3) * 1e-4)
    c2 = plane.oplus(c, v)
    back = plane.ominus(c2, c)
    expected = np.asarray(v) * np.array([-1.0, -1.0, 1.0])
    np.testing.assert_allclose(np.asarray(back), expected, atol=1e-7)


def test_transform_preserves_point_membership():
    # a point on the plane stays on the transformed plane
    rng = np.random.default_rng(2)
    c = plane.normalize(jnp.asarray([0.0, 0.0, 1.0, -2.0]))  # z = 2
    T = se3.se3_exp(jnp.asarray(rng.standard_normal(6)))
    p = jnp.asarray([3.0, -1.0, 2.0])
    # plane residual n.x + d
    c2 = plane.transform(T, c)
    p2 = se3.transform_points(T, p[None, :])[0]
    resid = jnp.dot(c2[:3], p2) + c2[3]
    assert abs(float(resid)) < 1e-9


def test_transform_identity():
    c = plane.normalize(jnp.asarray([0.2, 0.3, 0.93, 0.7]))
    out = plane.transform(jnp.eye(4), c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(c), atol=1e-12)


def test_ominus_safe_matches_ominus_first_order():
    # at generic (non-pole) configurations the safe variant equals g2o's
    # ominus to first order up to component sign (information-invariant)
    rng = np.random.default_rng(9)
    base = plane.normalize(jnp.asarray([0.4, 0.5, 0.76, 1.3]))
    for _ in range(10):
        eps = rng.standard_normal(4) * 1e-5
        other = plane.normalize(base + jnp.asarray(eps))
        a = np.asarray(plane.ominus(base, other))
        b = np.asarray(plane.ominus_safe(base, other))
        np.testing.assert_allclose(np.abs(a), np.abs(b), atol=1e-8)
        assert abs(np.linalg.norm(a) - np.linalg.norm(b)) < 1e-9


def test_ominus_safe_finite_grad_at_pole():
    import jax
    meas = jnp.asarray([0.0, 0.0, 1.0, 0.0])

    def err(d):
        p = plane.normalize(jnp.asarray([d[0], d[1], 1.0, d[2]]))
        return plane.ominus_safe(p, meas)

    J = jax.jacfwd(err)(jnp.zeros(3))
    assert bool(jnp.isfinite(J).all())
