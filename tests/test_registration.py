"""Registration engine tests: recover known rigid transforms on synthetic
LiDAR-like scenes with every method (the reference has no tests; transform
recovery + convergence flags are the per-kernel contract from SURVEY.md §4).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from hdl_graph_slam_tpu.core import cloud as cloudlib
from hdl_graph_slam_tpu.core import se3
from hdl_graph_slam_tpu.core.config import RegistrationConfig
from hdl_graph_slam_tpu.registration import Registration


def synthetic_scene(n=2000, seed=0):
    """A structured scene (floor + two walls + scatter) — has full 6-dof
    constraint, unlike a random blob."""
    rng = np.random.default_rng(seed)
    n_floor = n // 2
    n_wall = n // 4
    floor = np.stack(
        [rng.uniform(-10, 10, n_floor), rng.uniform(-10, 10, n_floor), rng.normal(0, 0.02, n_floor)],
        axis=1,
    )
    wall1 = np.stack(
        [rng.uniform(-10, 10, n_wall), rng.normal(8, 0.02, n_wall), rng.uniform(0, 3, n_wall)],
        axis=1,
    )
    wall2 = np.stack(
        [rng.normal(-9, 0.02, n_wall), rng.uniform(-10, 10, n_wall), rng.uniform(0, 3, n_wall)],
        axis=1,
    )
    return np.vstack([floor, wall1, wall2]).astype(np.float32)


def true_transform(dtype=np.float32):
    xi = jnp.asarray([0.3, -0.2, 0.05, 0.02, 0.03, 0.08], dtype=dtype)
    return se3.se3_exp(xi)


def _check_recovery(method, atol_t=0.05, atol_r=0.02, n=2000, resolution=1.0, guess=None):
    pts = synthetic_scene(n)
    T_true = np.asarray(true_transform(), dtype=np.float32)
    # source = scene in its own frame; target = scene seen from the moved pose
    # align(source -> target) should recover T_true with target = T_true * source
    src_pts = pts
    tgt_pts = src_pts @ T_true[:3, :3].T + T_true[:3, 3]

    src = cloudlib.from_numpy(src_pts)
    tgt = cloudlib.from_numpy(tgt_pts)

    cfg = RegistrationConfig(registration_method=method, reg_resolution=resolution)
    reg = Registration(cfg, max_voxels=4096)
    reg.set_target(tgt)
    res = reg.align(src, guess=guess)

    T_est = np.asarray(res.transformation)
    err = np.linalg.inv(T_est) @ T_true
    t_err = np.linalg.norm(err[:3, 3])
    r_err = float(se3.rotation_angle(jnp.asarray(err[:3, :3])))
    assert t_err < atol_t, f"{method}: translation error {t_err}"
    assert r_err < atol_r, f"{method}: rotation error {r_err}"
    assert bool(res.converged), f"{method}: did not converge"
    return reg, res


class TestGICP:
    def test_recover_transform(self):
        _check_recovery("FAST_GICP", atol_t=0.02, atol_r=0.01)

    def test_identity_on_same_cloud(self):
        pts = synthetic_scene(1000)
        c = cloudlib.from_numpy(pts)
        reg = Registration(RegistrationConfig(registration_method="FAST_GICP"))
        reg.set_target(c)
        res = reg.align(c)
        T = np.asarray(res.transformation)
        np.testing.assert_allclose(T, np.eye(4), atol=1e-3)
        assert reg.get_fitness_score() < 1e-6

    def test_fitness_score_reflects_misalignment(self):
        pts = synthetic_scene(1000)
        c = cloudlib.from_numpy(pts)
        reg = Registration(RegistrationConfig(registration_method="FAST_GICP"))
        reg.set_target(c)
        reg.align(c)
        good = reg.get_fitness_score()
        # fake a bad "alignment" by perturbing the stored result
        bad_T = np.eye(4, dtype=np.float32)
        bad_T[0, 3] = 0.5
        reg._last_result = reg._last_result._replace(transformation=jnp.asarray(bad_T))
        bad = reg.get_fitness_score()
        assert bad > good
        assert bad > 0.05  # a 0.5 m shift must show up clearly


class TestVGICP:
    def test_recover_transform(self):
        _check_recovery("FAST_VGICP", atol_t=0.05, atol_r=0.02, resolution=1.0)


class TestGatedReassociation:
    """Displacement-gated correspondence carry (base.lm_loop
    reassoc_displacement) must land on the same pose as fast_gicp's
    per-iteration re-association: convergence is only declared on a fresh
    association, so the fixed point is identical — only the path differs."""

    def _pair(self, seed=0):
        pts = synthetic_scene(3000, seed=seed)
        T_true = np.asarray(true_transform(), dtype=np.float32)
        src = cloudlib.from_numpy(pts)
        tgt = cloudlib.from_numpy(pts @ T_true[:3, :3].T + T_true[:3, 3])
        return src, tgt, T_true

    @pytest.mark.parametrize(
        "method,resolution,disp_on",
        [
            ("FAST_GICP", 1.0, 0.1),
            ("FAST_VGICP", 1.0, 0.1),
            # NDT gates cell re-association the same way (ndt.align); 0.5 m
            # budget at 2 m cells is the documented production setting
            # (core/config.py reg_reassoc_displacement)
            ("NDT_OMP", 2.0, 0.5),
        ],
    )
    def test_pose_parity_vs_per_iteration_reassoc(self, method, resolution, disp_on):
        src, tgt, T_true = self._pair()
        results = {}
        for disp in (0.0, disp_on):
            cfg = RegistrationConfig(
                registration_method=method, reg_resolution=resolution, reg_reassoc_displacement=disp
            )
            reg = Registration(cfg, max_voxels=4096)
            reg.set_target(tgt)
            res = reg.align(src)
            assert bool(res.converged), f"{method} disp={disp} did not converge"
            results[disp] = np.asarray(res.transformation)
        err = np.linalg.inv(results[0.0]) @ results[disp_on]
        t_err = np.linalg.norm(err[:3, 3])
        r_err = float(se3.rotation_angle(jnp.asarray(err[:3, :3])))
        assert t_err < 5e-3, f"{method}: gated/ungated translation differ by {t_err}"
        assert r_err < 5e-3, f"{method}: gated/ungated rotation differ by {r_err}"
        # and both recover the truth
        err_true = np.linalg.inv(results[disp_on]) @ T_true
        assert np.linalg.norm(err_true[:3, 3]) < 0.05

    def test_gated_from_cold_guess(self):
        """A cold (identity) guess forces real motion — the displacement
        budget must trigger mid-loop refreshes and still recover."""
        src, tgt, T_true = self._pair(seed=3)
        cfg = RegistrationConfig(registration_method="FAST_GICP", reg_reassoc_displacement=0.1)
        reg = Registration(cfg, max_voxels=4096)
        reg.set_target(tgt)
        res = reg.align(src)  # identity guess; truth is ~0.37 m + 0.09 rad away
        err = np.linalg.inv(np.asarray(res.transformation)) @ T_true
        assert np.linalg.norm(err[:3, 3]) < 0.05
        assert bool(res.converged)


class TestNDT:
    def test_recover_transform(self):
        _check_recovery("NDT_OMP", atol_t=0.1, atol_r=0.05, resolution=2.0)

    def test_direct1(self):
        pts = synthetic_scene(2000)
        T_true = np.asarray(true_transform())
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        cfg = RegistrationConfig(
            registration_method="NDT_OMP", reg_resolution=2.0, reg_nn_search_method="DIRECT1"
        )
        reg = Registration(cfg, max_voxels=4096)
        reg.set_target(cloudlib.from_numpy(tgt_pts))
        res = reg.align(cloudlib.from_numpy(pts))
        err = np.linalg.inv(np.asarray(res.transformation)) @ T_true
        assert np.linalg.norm(err[:3, 3]) < 0.15


class TestDenseGridParity:
    def test_ndt_dense_grid_matches_search(self):
        """NDT align through the dense O(1) grid must land on the same pose
        as the sorted-key binary search (the grid covers the whole scene)."""
        from hdl_graph_slam_tpu.registration import ndt

        pts = synthetic_scene(2000)
        T_true = np.asarray(true_transform())
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        src = cloudlib.from_numpy(pts)
        guess = jnp.eye(4)
        tgt_g = ndt.preprocess_target(cloudlib.from_numpy(tgt_pts), 2.0, max_voxels=4096, grid_size=64)
        tgt_s = ndt.preprocess_target(cloudlib.from_numpy(tgt_pts), 2.0, max_voxels=4096, grid_size=0)
        rg = ndt.align(tgt_g, src, guess)
        rs = ndt.align(tgt_s, src, guess)
        np.testing.assert_allclose(
            np.asarray(rg.transformation), np.asarray(rs.transformation), atol=1e-5
        )

    def test_vgicp_dense_grid_matches_search(self):
        from hdl_graph_slam_tpu.registration import gicp, vgicp

        pts = synthetic_scene(2000)
        T_true = np.asarray(true_transform())
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        src = gicp.preprocess(cloudlib.from_numpy(pts))
        guess = jnp.eye(4)
        tgt_g = vgicp.preprocess_target(cloudlib.from_numpy(tgt_pts), 1.0, max_voxels=4096, grid_size=64)
        tgt_s = vgicp.preprocess_target(cloudlib.from_numpy(tgt_pts), 1.0, max_voxels=4096, grid_size=0)
        rg = vgicp.align(tgt_g, src, guess)
        rs = vgicp.align(tgt_s, src, guess)
        np.testing.assert_allclose(
            np.asarray(rg.transformation), np.asarray(rs.transformation), atol=1e-5
        )


class TestNdtFixedCellLineSearch:
    def test_matches_reassociating_trials(self):
        """The fixed-cell line search (trials score against the current
        pose's cell association; the winner is re-scored fresh) must land on
        the same optimum as PCL-style per-trial re-association."""
        from hdl_graph_slam_tpu.registration import ndt

        pts = synthetic_scene(2000)
        T_true = np.asarray(true_transform())
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        tgt = ndt.preprocess_target(cloudlib.from_numpy(tgt_pts), 2.0, max_voxels=4096)
        src = cloudlib.from_numpy(pts)
        guess = jnp.eye(4)

        fast = ndt.align(tgt, src, guess, nn_search_method="DIRECT7", line_search_fixed_cells=True)
        exact = ndt.align(tgt, src, guess, nn_search_method="DIRECT7", line_search_fixed_cells=False)
        for res in (fast, exact):
            err = np.linalg.inv(np.asarray(res.transformation)) @ T_true
            assert np.linalg.norm(err[:3, 3]) < 0.1
            assert bool(res.converged)
        # the two search variants agree on the pose itself
        d = np.linalg.inv(np.asarray(fast.transformation)) @ np.asarray(exact.transformation)
        assert np.linalg.norm(d[:3, 3]) < 0.05


class TestICP:
    def test_recover_transform(self):
        _check_recovery("ICP", atol_t=0.1, atol_r=0.05)


class TestConvergenceGates:
    def test_nonoverlapping_clouds_dont_blow_up(self):
        rng = np.random.default_rng(3)
        a = rng.uniform(0, 5, (500, 3)).astype(np.float32)
        b = rng.uniform(100, 105, (500, 3)).astype(np.float32)
        reg = Registration(RegistrationConfig(registration_method="FAST_GICP"))
        reg.set_target(cloudlib.from_numpy(b))
        res = reg.align(cloudlib.from_numpy(a))
        # no correspondences within 2.5 m: transform must stay finite
        assert np.isfinite(np.asarray(res.transformation)).all()


class TestApproxExactParity:
    def test_approx_covariances_match_exact_alignment(self):
        """The approx_min_k covariance neighbors (TPU default) must produce
        the same alignment as exact kNN within tight tolerance (documented
        deviation, COVERAGE.md)."""
        import jax.numpy as jnp

        from hdl_graph_slam_tpu.registration import gicp

        pts = synthetic_scene(1500)
        T_true = np.asarray(true_transform(), dtype=np.float32)
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        src_c = cloudlib.from_numpy(pts)
        tgt_c = cloudlib.from_numpy(tgt_pts)
        guess = jnp.eye(4, dtype=jnp.float32)

        Ts = {}
        for exact in (True, False):
            tgt = gicp.preprocess(tgt_c, exact=exact)
            src = gicp.preprocess(src_c, exact=exact)
            res = gicp.align(tgt, src, guess)
            Ts[exact] = np.asarray(res.transformation)
        delta = np.linalg.inv(Ts[True]) @ Ts[False]
        assert np.linalg.norm(delta[:3, 3]) < 5e-3
        tr = np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1)
        assert np.arccos(tr) < 2e-3


class TestNdtQuadExp:
    def test_quadratic_exp_derivatives_match_exact(self):
        """NDT differentiates a quadratic expansion of exp at delta=0 for
        compile efficiency; its value/gradient/Hessian there must equal the
        exact exponential's."""
        import jax

        def exact(delta):
            return se3.se3_exp(delta)

        def quad(delta):
            W = jnp.zeros((4, 4))
            W = W.at[:3, :3].set(se3.hat(delta[3:]))
            W = W.at[:3, 3].set(delta[:3])
            return jnp.eye(4) + W + 0.5 * (W @ W)

        zero = jnp.zeros(6)
        np.testing.assert_allclose(np.asarray(exact(zero)), np.asarray(quad(zero)), atol=1e-12)
        Je = jax.jacfwd(exact)(zero)
        Jq = jax.jacfwd(quad)(zero)
        np.testing.assert_allclose(np.asarray(Je), np.asarray(Jq), atol=1e-9)
        He = jax.jacfwd(jax.jacfwd(exact))(zero)
        Hq = jax.jacfwd(jax.jacfwd(quad))(zero)
        np.testing.assert_allclose(np.asarray(He), np.asarray(Hq), atol=1e-9)


class TestNdtAnalyticDerivatives:
    def test_matches_autodiff(self):
        """The closed-form NDT gradient/Hessian (registration/ndt.py
        score_derivatives — Magnusson-style, twist parameterization) must
        equal jax.grad/jax.hessian of the composed mixture score through the
        quadratic exp truncation at delta=0 (the round-1 autodiff path)."""
        import jax

        from hdl_graph_slam_tpu.registration import ndt as ndtmod

        rng = np.random.default_rng(7)
        N, K = 50, 7
        moved0 = jnp.asarray(rng.normal(size=(N, 3)) * 3.0)
        means = jnp.asarray(moved0[:, None, :] + rng.normal(size=(N, K, 3)) * 0.5)
        A = rng.normal(size=(N, K, 3, 3)) * 0.4
        icovs = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(3))
        mask = jnp.asarray(rng.random(N) < 0.9)
        found = jnp.asarray(rng.random((N, K)) < 0.8)
        d1, d2 = jnp.asarray(-1.2), jnp.asarray(0.9)

        def quad_exp(delta):
            W = jnp.zeros((4, 4), moved0.dtype)
            W = W.at[:3, :3].set(se3.hat(delta[3:]))
            W = W.at[:3, 3].set(delta[:3])
            return jnp.eye(4, dtype=moved0.dtype) + W + 0.5 * (W @ W)

        def loss(delta):
            T = quad_exp(delta)
            moved = moved0 @ T[:3, :3].T + T[:3, 3]
            q = moved[:, None, :] - means
            md = jnp.einsum("nki,nkij,nkj->nk", q, icovs, q)
            e = d1 * jnp.exp(-0.5 * d2 * md)
            w = (found & mask[:, None]).astype(moved.dtype)
            return jnp.sum(e * w)

        zero = jnp.zeros(6, moved0.dtype)
        g_ref = np.asarray(jax.grad(loss)(zero))
        H_ref = np.asarray(jax.hessian(loss)(zero))
        g, H, score = ndtmod.score_derivatives(d1, d2, moved0, mask, means, icovs, found)
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(score), np.asarray(loss(zero)), rtol=1e-6)


class TestNdtSmallStepLargeScene:
    """Regression: a small translation against far points. The NDT Hessian's
    rotation block scales like r_max^2 over the translation block (~1e5 at
    50 m range); the old spectral-scale PD margin damped the translation
    directions by orders of magnitude over their true curvature, so the
    Newton step collapsed to sub-epsilon and align() declared convergence
    WITHOUT MOVING (windowed NDT odometry silently tracked nothing). The
    Marquardt-style relative margin must recover the offset."""

    def test_recovers_8cm_offset_at_50m_range(self):
        from hdl_graph_slam_tpu.registration import ndt as ndtmod

        rng = np.random.default_rng(7)
        n = 8192
        floor = np.stack(
            [rng.uniform(-50, 50, n // 2), rng.uniform(-50, 50, n // 2), rng.normal(0, 0.02, n // 2)], 1
        )
        walls = np.stack(
            [rng.uniform(-50, 50, n // 2), rng.normal(25, 0.05, n // 2), rng.uniform(0, 4, n // 2)], 1
        )
        walls[n // 4:] = walls[n // 4:][:, [1, 0, 2]]
        pts = np.concatenate([floor, walls]).astype(np.float32)
        offset = np.array([0.08, 0.0, 0.0], np.float32)
        src = cloudlib.from_numpy(pts)
        tgt = cloudlib.from_numpy(pts + offset)

        tgt_n = ndtmod.preprocess_target(tgt, 2.0, max_voxels=8192)
        res = ndtmod.align(tgt_n, src, jnp.eye(4, dtype=jnp.float32), nn_search_method="DIRECT7")
        t_est = np.asarray(res.transformation)[:3, 3]
        err = np.linalg.norm(t_est - offset)
        # the old margin left the estimate at ~the full 0.08 offset
        assert err < 0.04, f"NDT failed to recover a small offset: err={err}, t={t_est}"


class TestNdtKdtreeMode:
    def test_kdtree_matches_direct7_accuracy(self):
        """KDTREE neighbor mode (radius search over cell centroids, the
        pclomp kd-tree semantics) must recover the transform at least as
        well as DIRECT7 on a structured scene — closing the round-1 gap
        where KDTREE was silently served by DIRECT7 (VERDICT r1 missing #5)."""
        from hdl_graph_slam_tpu.registration import ndt

        pts = synthetic_scene(3000)
        T_true = np.asarray(true_transform())
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        tgt_c = cloudlib.from_numpy(tgt_pts, capacity=4096)
        src_c = cloudlib.from_numpy(pts, capacity=4096)

        tgt = ndt.preprocess_target(tgt_c, 2.0, max_voxels=4096)
        errs = {}
        for mode in ("DIRECT7", "KDTREE", "DIRECT1"):
            res = ndt.align(tgt, src_c, jnp.eye(4), nn_search_method=mode)
            err = np.linalg.inv(np.asarray(res.transformation)) @ T_true
            errs[mode] = np.linalg.norm(err[:3, 3])
            assert bool(res.converged), mode
        assert errs["KDTREE"] < 0.15, errs
        assert errs["DIRECT7"] < 0.15, errs
        # KDTREE and DIRECT7 should agree closely (same cells most of the time)
        assert abs(errs["KDTREE"] - errs["DIRECT7"]) < 0.1, errs

    def test_factory_kdtree_mode(self):
        """select_registration_method passes KDTREE through to the real mode."""
        pts = synthetic_scene(2000)
        T_true = np.asarray(true_transform())
        tgt_pts = pts @ T_true[:3, :3].T + T_true[:3, 3]
        cfg = RegistrationConfig(
            registration_method="NDT_OMP", reg_resolution=2.0, reg_nn_search_method="KDTREE"
        )
        reg = Registration(cfg, max_voxels=4096)
        reg.set_target(cloudlib.from_numpy(tgt_pts))
        res = reg.align(cloudlib.from_numpy(pts))
        err = np.linalg.inv(np.asarray(res.transformation)) @ T_true
        assert np.linalg.norm(err[:3, 3]) < 0.15


class TestProcrustesRotation:
    def test_matches_svd_solution(self):
        """The eig3-based Procrustes rotation (registration/icp.py — LAPACK
        SVD crashes the TPU compiler inside while_loop) must match the SVD
        R = V D U^T on random full-rank, reflected, and near-planar
        cross-covariances."""
        from hdl_graph_slam_tpu.registration.icp import procrustes_rotation

        rng = np.random.default_rng(4)

        def svd_ref(S):
            U, _, Vt = np.linalg.svd(S)
            d = np.sign(np.linalg.det(Vt.T @ U.T))
            D = np.diag([1.0, 1.0, d])
            return Vt.T @ D @ U.T

        cases = []
        for _ in range(20):
            cases.append(rng.normal(size=(3, 3)))           # generic (half reflections)
        for _ in range(5):
            A = rng.normal(size=(3, 3))
            A[:, 2] *= 1e-5                                 # near rank-2 (planar)
            cases.append(A)
        for S in cases:
            R = np.asarray(procrustes_rotation(jnp.asarray(S)))
            Rref = svd_ref(S)
            assert abs(np.linalg.det(R) - 1.0) < 1e-6
            np.testing.assert_allclose(R, Rref, atol=5e-4), S

    def test_degenerate_cross_covariance_stays_on_so3(self):
        """Round-5 regression: S ~ 0 (every ICP correspondence lost) used to
        collapse both eigenvector fallbacks onto +z, cross(v3, v1) == 0, and
        the returned 'rotation' was SINGULAR — silently poisoning the pose
        chain (det err 0.065 caught by the r5 bench guards). Zero, rank-1,
        z-aligned-rank-1 and tiny-noise cross-covariances must all return a
        proper rotation (identity for the no-information cases)."""
        from hdl_graph_slam_tpu.registration.icp import procrustes_rotation

        rng = np.random.default_rng(5)
        z = np.zeros((3, 3))
        rank1 = np.outer([0.0, 0.0, 1.0], [0.0, 0.0, 1.0])  # v1 == fallback z
        rank1b = np.outer([1.0, 0.0, 0.0], [0.6, 0.8, 0.0])
        tiny = rng.normal(size=(3, 3)) * 1e-14
        for S in (z, rank1, rank1b, tiny):
            R = np.asarray(procrustes_rotation(jnp.asarray(S, jnp.float32)))
            assert np.isfinite(R).all(), S
            assert abs(np.linalg.det(R) - 1.0) < 1e-4, (S, R)
            assert np.abs(R @ R.T - np.eye(3)).max() < 1e-4, (S, R)
        np.testing.assert_allclose(
            np.asarray(procrustes_rotation(jnp.asarray(z, jnp.float32))), np.eye(3), atol=1e-6
        )
