import jax
import jax.numpy as jnp
import numpy as np

from hdl_graph_slam_tpu.core import cloud as cloudlib
from hdl_graph_slam_tpu.ops import filters, knn, normals, ransac, voxel


def make_cloud(n=500, seed=0, scale=10.0, cap=None):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-scale, scale, size=(n, 3))
    return cloudlib.from_numpy(pts, capacity=cap), pts


class TestKNN:
    def test_nn1_exact(self):
        c1, q = make_cloud(300, seed=1)
        c2, t = make_cloud(400, seed=2)
        idx, d2 = knn.nn1(c1.valid_xyz(), c2.valid_xyz())
        # numpy brute force over the valid points
        d_full = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
        expect_idx = d_full.argmin(1)
        expect_d2 = d_full.min(1)
        got_idx = np.asarray(idx)[:300]
        got_d2 = np.asarray(d2)[:300]
        np.testing.assert_allclose(got_d2, expect_d2, rtol=1e-5)
        assert (got_idx == expect_idx).mean() > 0.999

    def test_knn_exact_far_from_origin(self):
        """knn()'s exact contract at map-frame coordinates: candidate
        selection is bbox-centered so f32 cancellation at ~1e2 m offsets
        cannot drop a true neighbor (ADVICE r1)."""
        rng = np.random.default_rng(33)
        base = rng.uniform(0, 2.0, size=(256, 3))
        off = np.array([150.0, -220.0, 40.0])
        q32 = (base[:128] + off).astype(np.float32)
        t32 = (base + off).astype(np.float32)
        idx, d2 = knn.knn(jnp.asarray(q32), jnp.asarray(t32), 4)
        d_full = ((q32.astype(np.float64)[:, None, :] - t32.astype(np.float64)[None, :, :]) ** 2).sum(-1)
        expect = np.sort(d_full, axis=1)[:, :4]
        np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), expect, rtol=1e-4, atol=1e-6)

    def test_knn_exact(self):
        c1, q = make_cloud(128, seed=3)
        c2, t = make_cloud(256, seed=4)
        idx, d2 = knn.knn(c1.valid_xyz(), c2.valid_xyz(), k=5)
        d_full = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
        expect = np.sort(d_full, axis=1)[:, :5]
        np.testing.assert_allclose(np.asarray(d2)[:128], expect, rtol=1e-5)

    def test_padding_never_matches(self):
        c1, _ = make_cloud(100, seed=5, cap=256)
        c2, _ = make_cloud(50, seed=6, cap=256)
        idx, d2 = knn.nn1(c1.valid_xyz(), c2.valid_xyz())
        # all matches must land on valid target rows (< 50)
        assert np.asarray(idx)[:100].max() < 50

    def test_radius_count(self):
        c, pts = make_cloud(200, seed=7, scale=2.0)
        r = 0.8
        counts = knn.radius_count(c.valid_xyz(), c.valid_xyz(), r)
        d_full = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        expect = (d_full < r).sum(1)  # includes self
        np.testing.assert_array_equal(np.asarray(counts)[:200], expect)

    def test_fitness_score(self):
        c, pts = make_cloud(300, seed=8)
        T = np.eye(4)
        T[:3, 3] = [0.05, 0.0, 0.0]
        score = knn.fitness_score(
            c.valid_xyz(), c.xyz, c.mask, jnp.asarray(T)
        )
        # shifting by 0.05 gives mean sq dist <= 0.0025
        assert 0 < float(score) <= 0.0025 + 1e-9


class TestVoxel:
    def test_centroid_downsample(self):
        pts = np.array(
            [[0.1, 0.1, 0.1], [0.3, 0.2, 0.15], [2.1, 0.1, 0.1], [2.3, 0.3, 0.3]]
        )
        c = cloudlib.from_numpy(pts, capacity=8)
        out = voxel.voxel_downsample(c, 1.0, max_voxels=8)
        got = out.to_numpy()
        assert got.shape[0] == 2
        got = got[np.argsort(got[:, 0])]
        np.testing.assert_allclose(got[0], [0.2, 0.15, 0.125], atol=1e-6)
        np.testing.assert_allclose(got[1], [2.2, 0.2, 0.2], atol=1e-6)

    def test_downsample_counts(self):
        c, pts = make_cloud(2000, seed=9, scale=5.0)
        out = voxel.voxel_downsample(c, 1.0, max_voxels=2048)
        expect_vox = len(set(map(tuple, np.floor(pts / 1.0).astype(int))))
        assert int(out.count) == expect_vox

    def test_negative_coords(self):
        pts = np.array([[-0.5, -0.5, -0.5], [-0.4, -0.6, -0.5], [0.5, 0.5, 0.5]])
        c = cloudlib.from_numpy(pts, capacity=8)
        out = voxel.voxel_downsample(c, 1.0, max_voxels=8)
        assert int(out.count) == 2

    def test_occupied_voxel_centers(self):
        pts = np.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8], [1.5, 0.5, 0.5]])
        c = cloudlib.from_numpy(pts, capacity=8)
        out = voxel.occupied_voxel_centers(c, 1.0, max_voxels=8)
        got = out.to_numpy()
        got = got[np.argsort(got[:, 0])]
        np.testing.assert_allclose(got[0], [0.5, 0.5, 0.5], atol=1e-6)
        np.testing.assert_allclose(got[1], [1.5, 0.5, 0.5], atol=1e-6)

    def test_gaussian_voxels(self):
        rng = np.random.default_rng(10)
        pts = rng.normal(scale=0.05, size=(100, 3)) + np.array([0.5, 0.5, 0.5])
        c = cloudlib.from_numpy(pts, capacity=128)
        gv = voxel.build_gaussian_voxels(c, 1.0, max_voxels=16, min_points=6)
        assert int(jnp.sum(gv.mask)) == 1
        i = int(jnp.argmax(gv.mask))
        np.testing.assert_allclose(np.asarray(gv.means[i]), pts.mean(0), atol=1e-6)
        emp_cov = np.cov(pts.T, bias=True)
        np.testing.assert_allclose(np.asarray(gv.covs[i]), emp_cov, atol=1e-3)

    def test_voxel_lookup(self):
        c, pts = make_cloud(500, seed=11, scale=4.0)
        gv = voxel.build_gaussian_voxels(c, 2.0, max_voxels=256, min_points=1)
        keys = voxel.query_keys_for(gv, c.xyz, c.mask)
        idx, found = voxel.lookup_voxels(gv, keys)
        assert bool(jnp.all(found[:500]))
        # each point's voxel mean must be within half-diagonal of the point
        means = gv.means[idx]
        d = jnp.linalg.norm(means[:500] - c.xyz[:500], axis=-1)
        assert float(jnp.max(d)) < 2.0 * np.sqrt(3)

    def test_neighbor_offsets(self):
        off7 = voxel.neighbor_offsets("DIRECT7")
        assert off7.shape == (7, 3)
        # neighbor keys of a point well inside a local grid are all distinct
        c, _ = make_cloud(100, seed=3, scale=4.0)
        gv = voxel.build_gaussian_voxels(c, 1.0, max_voxels=256, min_points=1)
        nk = voxel.neighbor_query_keys(gv, jnp.zeros((1, 3)), jnp.ones(1, dtype=bool), off7)
        assert nk.shape == (1, 7)
        vals = np.asarray(nk[0]).tolist()
        assert len(set(vals)) == 7

    def test_searchsorted32_matches_jnp(self):
        """The unrolled int32 binary search must match jnp.searchsorted
        (side='left') on sorted arrays with duplicates, sentinels, and
        out-of-range queries — it replaces it in every align-loop lookup."""
        rng = np.random.default_rng(23)
        for n in (1, 7, 256, 1000):
            a = np.sort(rng.integers(-50, 50, n).astype(np.int32))
            q = rng.integers(-60, 60, 500).astype(np.int32)
            got = np.asarray(voxel.searchsorted32(jnp.asarray(a), jnp.asarray(q)))
            want = np.searchsorted(a, q, side="left")
            np.testing.assert_array_equal(got, want)

    def test_local_downsample_matches_global(self):
        """int32 local-key downsample must be bit-identical to the int64
        global-key path (same centroids, same deterministic key order) —
        the local re-key is a monotone shift of the cell coordinates."""
        c, pts = make_cloud(2000, seed=12, scale=20.0)
        a = voxel.voxel_downsample(c, 0.5, max_voxels=2048)
        b = voxel.voxel_downsample_local(c, 0.5, max_voxels=2048)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_allclose(
            np.asarray(a.xyz)[np.asarray(a.mask)], np.asarray(b.xyz)[np.asarray(b.mask)], atol=1e-6
        )

    def test_local_downsample_negative_coords(self):
        pts = np.array([[-0.5, -0.5, -0.5], [-0.4, -0.6, -0.5], [0.5, 0.5, 0.5]])
        c = cloudlib.from_numpy(pts, capacity=8)
        out = voxel.voxel_downsample_local(c, 1.0, max_voxels=8)
        assert int(out.count) == 2

    def test_local_grid_fits(self):
        assert voxel.local_grid_fits(200.0, 0.2)  # 1000 + 2 < 1024
        assert not voxel.local_grid_fits(205.0, 0.2)  # 1025 + 2 >= 1024

    def test_gaussian_voxel_resolution_dtype(self):
        """The stored resolution must carry the CLOUD's dtype: tests/CLI run
        with x64 enabled, where a bare asarray(python_float) is strong f64 —
        it would silently promote every align-loop local_cells division to
        emulated f64 on TPU (observed 6-20x NDT slowdown)."""
        c, _ = make_cloud(100, seed=3, scale=4.0)
        gv = voxel.build_gaussian_voxels(c, 1.0, max_voxels=64, min_points=1)
        assert gv.resolution.dtype == c.xyz.dtype
        from hdl_graph_slam_tpu.registration import vgicp

        vt = vgicp.preprocess_target(c, 1.0, max_voxels=64)
        assert vt.resolution.dtype == c.xyz.dtype

    def test_local_keys_out_of_grid_not_found(self):
        """Queries outside the target's 1024^3 local grid must report
        not-found (the align-loop semantics), never alias a real cell."""
        c, _ = make_cloud(200, seed=5, scale=4.0)
        gv = voxel.build_gaussian_voxels(c, 1.0, max_voxels=256, min_points=1)
        far = jnp.asarray([[5000.0, 0.0, 0.0], [-5000.0, 2.0, 1.0]])
        keys = voxel.query_keys_for(gv, far, jnp.ones(2, dtype=bool))
        _, found = voxel.lookup_voxels(gv, keys)
        assert not bool(jnp.any(found))

    def test_dense_grid_matches_binary_search(self):
        """lookup_dense must agree with lookup_voxels for every in-grid query
        (hits AND misses): it replaces the binary search in the NDT/VGICP
        align loops, one gather per query."""
        c, _ = make_cloud(2000, seed=7, scale=15.0)
        gv = voxel.build_gaussian_voxels(c, 1.0, max_voxels=512, min_points=1)
        grid = voxel.build_dense_grid(gv.keys, gv.mask, 64)
        rng = np.random.default_rng(8)
        pts = jnp.asarray(rng.uniform(-18, 18, (500, 3)).astype(np.float32))
        qkeys = voxel.query_keys_for(gv, pts, jnp.ones(500, dtype=bool))
        i_ref, f_ref = voxel.lookup_voxels(gv, qkeys)
        i_new, f_new = voxel.lookup_dense(grid, qkeys, 64)
        np.testing.assert_array_equal(np.asarray(f_new), np.asarray(f_ref))
        hits = np.asarray(f_ref)
        np.testing.assert_array_equal(np.asarray(i_new)[hits], np.asarray(i_ref)[hits])

    def test_dense_grid_out_of_grid_not_found(self):
        """Cells beyond the G^3 dense grid report not-found — never alias."""
        c, _ = make_cloud(500, seed=6, scale=40.0)  # spans > 16 cells at res 1.0
        gv = voxel.build_gaussian_voxels(c, 1.0, max_voxels=512, min_points=1)
        grid = voxel.build_dense_grid(gv.keys, gv.mask, 16)
        qkeys = voxel.query_keys_for(gv, c.xyz, c.mask)
        idx, found = voxel.lookup_dense(grid, qkeys, 16)
        # every reported hit must be a true key match in the table
        hits = np.asarray(found)
        assert hits.any()  # some cells fall inside the 16^3 corner
        np.testing.assert_array_equal(
            np.asarray(gv.keys)[np.asarray(idx)[hits]], np.asarray(qkeys)[hits]
        )
        # and cells outside the grid are misses even though they're in the table
        i_ref, f_ref = voxel.lookup_voxels(gv, qkeys)
        assert int(np.sum(np.asarray(f_ref))) > int(np.sum(hits))

    def test_min_points_masking_keeps_table_sorted(self):
        """Cells failing min_points must not break the sorted key order the
        binary-search lookup depends on (regression: a masked mid-sequence
        cell turned every later lookup into a miss)."""
        rng = np.random.default_rng(9)
        # dense cluster (passes min_points) + isolated single points (fail)
        dense = rng.normal(scale=0.2, size=(200, 3)) + np.array([5.0, 5.0, 0.0])
        sparse = rng.uniform(-20, 20, (30, 3))
        c = cloudlib.from_numpy(np.vstack([dense, sparse]).astype(np.float32), capacity=256)
        gv = voxel.build_gaussian_voxels(c, 1.0, max_voxels=128, min_points=6)
        keys = np.asarray(gv.keys)
        assert np.all(np.diff(keys.astype(np.int64)) >= 0), "table not sorted"
        # every dense-cluster point must find its (valid) cell
        qk = voxel.query_keys_for(gv, jnp.asarray(dense.astype(np.float32)), jnp.ones(len(dense), bool))
        _, found = voxel.lookup_voxels(gv, qk)
        assert float(jnp.mean(found.astype(jnp.float32))) > 0.95


class TestFilters:
    def test_distance_filter(self):
        pts = np.array([[0.5, 0, 0], [5, 0, 0], [200, 0, 0]])
        c = cloudlib.from_numpy(pts, capacity=8)
        out = filters.distance_filter(c, 1.0, 100.0)
        assert int(out.count) == 1
        np.testing.assert_allclose(out.to_numpy()[0], [5, 0, 0])

    def test_radius_outlier(self):
        rng = np.random.default_rng(12)
        cluster = rng.normal(scale=0.1, size=(50, 3))
        outlier = np.array([[50.0, 50.0, 50.0]])
        c = cloudlib.from_numpy(np.vstack([cluster, outlier]), capacity=64)
        out = filters.radius_outlier_removal(c, radius=1.0, min_neighbors=2)
        assert int(out.count) == 50

    def test_statistical_outlier(self):
        rng = np.random.default_rng(13)
        cluster = rng.uniform(-1, 1, size=(100, 3))
        outlier = np.array([[30.0, 0.0, 0.0]])
        c = cloudlib.from_numpy(np.vstack([cluster, outlier]), capacity=128)
        out = filters.statistical_outlier_removal(c, mean_k=10, stddev_mul_thresh=1.0)
        m = np.asarray(out.mask)
        assert not m[100]  # outlier dropped
        assert m[:100].sum() > 80  # most of the cluster kept

    def test_plane_clip(self):
        pts = np.array([[0, 0, 1.0], [0, 0, -1.0]])
        c = cloudlib.from_numpy(pts, capacity=4)
        # plane z = 0 with normal +z: signed dist of p0 = +1, p1 = -1
        keep_pos = filters.plane_clip(c, jnp.asarray([0.0, 0, 1, 0]), negative=False)
        assert np.asarray(keep_pos.mask)[:2].tolist() == [True, False]
        keep_neg = filters.plane_clip(c, jnp.asarray([0.0, 0, 1, 0]), negative=True)
        assert np.asarray(keep_neg.mask)[:2].tolist() == [False, True]

    def test_deskew_identity_for_zero_angvel(self):
        c, pts = make_cloud(50, seed=14)
        out = filters.deskew(c, jnp.zeros(3), 0.1)
        np.testing.assert_allclose(out.to_numpy(), pts, atol=1e-7)

    def test_deskew_padding_invariant(self):
        """The per-point time ramp divides by the valid count (reference
        divides by cloud->size()), so growing the padded capacity must not
        change the deskewed coordinates of the valid points."""
        rng = np.random.default_rng(21)
        pts = rng.uniform(-10, 10, size=(100, 3))
        ang = jnp.asarray([0.3, -0.2, 0.5])
        small = cloudlib.from_numpy(pts, capacity=128)
        big = cloudlib.from_numpy(pts, capacity=512)
        out_s = filters.deskew(small, ang, 0.1).to_numpy()
        out_b = filters.deskew(big, ang, 0.1).to_numpy()
        np.testing.assert_allclose(out_s, out_b, atol=1e-9)
        # and it must actually rotate something
        assert np.abs(out_s - pts).max() > 1e-3


class TestCapacityOverflow:
    """When a scan exceeds capacity, from_numpy/stack_scans must take a
    UNIFORM strided subsample, not the head: spinning-lidar points arrive
    ring-major, so head truncation drops the upper rings — on the golden
    town course that left ~99% ground points and no horizontal constraint
    (the round-3 ATE=23.8 m result; see benchmarks/golden_town.py)."""

    def test_from_numpy_subsamples_uniformly(self):
        # ring-major layout: first half "ground" (z=0), second half "walls"
        n = 1000
        pts = np.zeros((n, 3))
        pts[:, 0] = np.arange(n)
        pts[n // 2:, 2] = 5.0
        c = cloudlib.from_numpy(pts, capacity=100)
        kept = np.asarray(c.xyz)[np.asarray(c.mask)]
        assert kept.shape[0] == 100
        wall_frac = np.mean(kept[:, 2] > 1.0)
        assert 0.4 < wall_frac < 0.6, wall_frac  # head truncation would give 0
        # intensity rides the same subsample
        c2 = cloudlib.from_numpy(pts, capacity=100, intensity=pts[:, 0].copy())
        inten = np.asarray(c2.intensity)[np.asarray(c2.mask)]
        np.testing.assert_allclose(inten, kept[:, 0], atol=0)

    def test_stack_scans_subsamples_uniformly(self):
        from hdl_graph_slam_tpu.frontend.window import stack_scans

        n = 1000
        pts = np.zeros((n, 3))
        pts[n // 2:, 2] = 5.0
        xyz, mask = stack_scans([pts, pts[:50]], capacity=100)
        assert mask[0].sum() == 100 and mask[1].sum() == 50
        wall_frac = np.mean(xyz[0][mask[0]][:, 2] > 1.0)
        assert 0.4 < wall_frac < 0.6, wall_frac

    def test_no_subsample_when_it_fits(self):
        pts = np.arange(30, dtype=np.float64).reshape(10, 3)
        c = cloudlib.from_numpy(pts, capacity=16)
        np.testing.assert_allclose(np.asarray(c.xyz)[:10], pts)


class TestNormals:
    def test_plane_normals(self):
        rng = np.random.default_rng(15)
        pts = np.zeros((200, 3))
        pts[:, :2] = rng.uniform(-5, 5, size=(200, 2))
        c = cloudlib.from_numpy(pts, capacity=256)
        n = normals.estimate_normals(c, k=10, viewpoint=jnp.asarray([0.0, 0, 10.0]))
        nz = np.asarray(n)[:200, 2]
        np.testing.assert_allclose(nz, np.ones(200), atol=1e-5)


class TestRansac:
    def test_fit_floor_plane(self):
        rng = np.random.default_rng(16)
        n_plane, n_noise = 400, 100
        plane_pts = np.zeros((n_plane, 3))
        plane_pts[:, :2] = rng.uniform(-10, 10, size=(n_plane, 2))
        plane_pts[:, 2] = -1.8 + rng.normal(scale=0.02, size=n_plane)
        noise = rng.uniform(-10, 10, size=(n_noise, 3))
        c = cloudlib.from_numpy(np.vstack([plane_pts, noise]), capacity=512)
        res = ransac.fit_plane(c, jax.random.PRNGKey(0), distance_thresh=0.1)
        coeffs = np.asarray(res.coeffs)
        if coeffs[2] < 0:
            coeffs = -coeffs
        np.testing.assert_allclose(coeffs[:3], [0, 0, 1], atol=0.02)
        assert abs(coeffs[3] - 1.8) < 0.05
        assert int(res.num_inliers) > 350


class TestEig3:
    def test_eigvals_match_numpy(self):
        from hdl_graph_slam_tpu.ops import eig3

        rng = np.random.default_rng(20)
        A = rng.standard_normal((200, 3, 3))
        A = A @ np.swapaxes(A, 1, 2)
        lams = np.asarray(eig3.eigvalsh3(jnp.asarray(A)))
        expect = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(lams, expect, rtol=1e-6, atol=1e-8)

    def test_smallest_eigenvector(self):
        from hdl_graph_slam_tpu.ops import eig3

        rng = np.random.default_rng(21)
        A = rng.standard_normal((100, 3, 3))
        A = A @ np.swapaxes(A, 1, 2)
        lam, v = eig3.smallest_eigenvector3(jnp.asarray(A))
        # A v = lam v
        Av = np.einsum("nij,nj->ni", A, np.asarray(v))
        np.testing.assert_allclose(Av, np.asarray(lam)[:, None] * np.asarray(v), atol=1e-6)

    def test_plane_regularize(self):
        from hdl_graph_slam_tpu.ops import eig3

        rng = np.random.default_rng(22)
        A = rng.standard_normal((50, 3, 3)) * 0.5
        A = A @ np.swapaxes(A, 1, 2)
        R = np.asarray(eig3.plane_regularize(jnp.asarray(A)))
        lams = np.linalg.eigvalsh(R)
        np.testing.assert_allclose(lams[:, 0], 1e-3, atol=1e-6)
        np.testing.assert_allclose(lams[:, 1:], 1.0, atol=1e-6)

    def test_floor_regularize(self):
        from hdl_graph_slam_tpu.ops import eig3

        rng = np.random.default_rng(23)
        # very flat covariances
        d = np.stack([np.diag([4.0, 1.0, 1e-6]) for _ in range(10)])
        q = rng.standard_normal((10, 3, 3))
        Q = np.linalg.qr(q)[0]
        A = np.einsum("nij,njk,nlk->nil", Q, d, Q)
        R = np.asarray(eig3.floor_regularize(jnp.asarray(A), rel_floor=0.01))
        lams = np.linalg.eigvalsh(R)
        assert (lams[:, 0] >= 0.01 * lams[:, 2] - 1e-7).all()
        # lam_max picks up the rel_guard diagonal (1e-3 relative)
        np.testing.assert_allclose(lams[:, 2], 4.0 * 1.001, rtol=1e-5)

    def test_floor_regularize_pd_guard_on_rank1_f32(self):
        """Round-5 regression: a near-rank-1 cell (ground ring-arc = a LINE
        of points) has a nearly degenerate null 2-space; the closed-form f32
        eigenvectors there are noise-dominated and the rank-2 floor
        correction alone can leave a residual NEGATIVE eigenvalue (observed
        -3e-5*lam_max on TPU), whose inverse is indefinite (eig ~ -1e5) and
        overflows the NDT mixture exp into -inf. The rel_guard diagonal must
        keep the result PD BY CONSTRUCTION in f32, and the icov chain
        (inv3x3 of guarded + 1e-6 I, as ndt.preprocess_target builds it)
        must stay positive-definite."""
        from hdl_graph_slam_tpu.ops import eig3
        from hdl_graph_slam_tpu.registration.gicp import _inv3x3

        rng = np.random.default_rng(24)
        # thin arcs: points along slightly curved lines at random orientations
        covs = []
        for _ in range(200):
            t = rng.uniform(0, 1.2, 40)
            pts = np.stack([t, 0.02 * t * t, 1e-4 * rng.standard_normal(40)], 1)
            Q = np.linalg.qr(rng.standard_normal((3, 3)))[0]
            pts = pts @ Q.T
            covs.append(np.cov(pts.T))
        A = jnp.asarray(np.stack(covs), jnp.float32)
        R = np.asarray(eig3.floor_regularize(A)).astype(np.float64)
        lams = np.linalg.eigvalsh(R)
        # PD with at least half the guard to spare, for every cell
        assert (lams[:, 0] >= 0.5e-3 * lams[:, 2]).all(), lams[:, 0].min()
        icovs = np.asarray(_inv3x3(jnp.asarray(R, jnp.float32) + 1e-6 * jnp.eye(3, dtype=jnp.float32)))
        ilams = np.linalg.eigvalsh(icovs.astype(np.float64))
        assert (ilams[:, 0] > 0).all(), ilams[:, 0].min()

    def test_ndt_score_finite_under_indefinite_icov(self):
        """Belt for the same failure: even with a deliberately indefinite
        icov row, the NDT score and analytic derivatives must stay finite
        (the Mahalanobis form is clamped at 0) — a -inf score makes the
        Newton loop false-converge at iteration 1."""
        import jax

        from hdl_graph_slam_tpu.registration import ndt

        N, K = 64, 7
        rng = np.random.default_rng(25)
        moved = jnp.asarray(rng.standard_normal((N, 3)) * 5.0, jnp.float32)
        means = jnp.asarray(rng.standard_normal((N, K, 3)) * 5.0, jnp.float32)
        icovs = np.tile(np.eye(3, dtype=np.float32), (N, K, 1, 1))
        icovs[0, 0] = np.diag([-9.8e4, 2.5, 128.0]).astype(np.float32)  # the observed bad row
        found = jnp.ones((N, K), bool)
        mask = jnp.ones((N,), bool)
        d1 = jnp.float32(-4.1965)
        d2 = jnp.float32(0.2484)
        g, H, score = ndt.score_derivatives(d1, d2, moved, mask, means, jnp.asarray(icovs), found)
        assert np.isfinite(float(score)), float(score)
        assert np.isfinite(np.asarray(g)).all() and np.isfinite(np.asarray(H)).all()


class TestSmallSolve:
    def test_solve_spd_matches_numpy(self):
        from hdl_graph_slam_tpu.ops import small_solve

        rng = np.random.default_rng(17)
        for _ in range(5):
            A = rng.standard_normal((6, 6))
            A = (A @ A.T + 6 * np.eye(6)).astype(np.float32)
            b = rng.standard_normal(6).astype(np.float32)
            x = np.asarray(small_solve.solve_spd(jnp.asarray(A), jnp.asarray(b)))
            np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=2e-4, atol=2e-5)

    def test_gershgorin_lower_bounds_min_eig(self):
        from hdl_graph_slam_tpu.ops import small_solve

        rng = np.random.default_rng(18)
        A = rng.standard_normal((10, 6, 6)).astype(np.float32)
        A = A + np.swapaxes(A, -1, -2)
        g = np.asarray(jax.vmap(small_solve.gershgorin_min)(jnp.asarray(A)))
        true_min = np.linalg.eigvalsh(A)[:, 0]
        assert (g <= true_min + 1e-5).all()


class TestPallasNN:
    def test_matches_xla_in_interpret_mode(self):
        """The fused kernel must agree with the XLA path (interpret mode on
        CPU; compiled path validated on TPU)."""
        from jax.experimental import pallas as pl  # noqa: F401
        import hdl_graph_slam_tpu.ops.pallas_nn as pnn

        rng = np.random.default_rng(30)
        q = jnp.asarray(rng.uniform(-10, 10, (300, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-10, 10, (400, 3)).astype(np.float32))
        i_ref, d_ref = knn.nn1(q, t)
        i2, d2 = pnn.nn1_pallas(q, t, interpret=True)
        assert float(jnp.mean((i_ref == i2).astype(jnp.float32))) > 0.999
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d_ref), rtol=1e-4, atol=1e-5)


class TestDenseGridSizing:
    def test_covers_span_at_coarse_resolutions(self):
        from hdl_graph_slam_tpu.ops.voxel import DENSE_GRID_SIZE, dense_grid_size_for

        assert dense_grid_size_for(2.0) == 128   # 256 m at 2 m cells
        assert dense_grid_size_for(10.0) == 64   # cap at the 64 floor
        assert dense_grid_size_for(1.0) == 256
        # below 1.0 the DENSE_GRID_SIZE cap wins (legacy 256*res coverage)
        assert dense_grid_size_for(0.5) == DENSE_GRID_SIZE
        for res in (0.5, 1.0, 2.0, 4.0, 10.0):
            g = dense_grid_size_for(res)
            assert 64 <= g <= DENSE_GRID_SIZE and (g & (g - 1)) == 0


class TestBatchedMapGeneration:
    """MapCloudGenerator's one-program fast path (equal-capacity snapshots)
    must produce exactly the per-snapshot fallback's voxel centers."""

    def test_fast_path_matches_fallback(self):
        import numpy as np
        from hdl_graph_slam_tpu.backend.keyframe import KeyFrameSnapshot
        from hdl_graph_slam_tpu.backend.map_cloud import MapCloudGenerator
        from hdl_graph_slam_tpu.core import cloud as cloudlib

        rng = np.random.default_rng(3)
        snaps = []
        for k in range(5):
            pts = rng.uniform(-10, 10, (700 + 50 * k, 3)).astype(np.float32)
            pose = np.eye(4)
            pose[0, 3] = 2.0 * k
            pose[1, 3] = -0.5 * k
            snaps.append(KeyFrameSnapshot(pose=pose, cloud=cloudlib.from_numpy(pts, capacity=1024)))
        g = MapCloudGenerator()
        fast = g.generate(snaps, resolution=0.5)

        # force the per-snapshot fallback by making capacities differ
        mixed = list(snaps)
        c0 = mixed[0].cloud
        mixed[0] = KeyFrameSnapshot(
            pose=mixed[0].pose,
            cloud=cloudlib.from_numpy(np.asarray(c0.xyz)[np.asarray(c0.mask)], capacity=2048),
        )
        slow = g.generate(mixed, resolution=0.5)

        fa = fast[np.lexsort(fast.T)]
        sl = slow[np.lexsort(slow.T)]
        assert fa.shape == sl.shape
        np.testing.assert_allclose(fa, sl, atol=1e-5)

    def test_raw_resolution_zero(self):
        import numpy as np
        from hdl_graph_slam_tpu.backend.keyframe import KeyFrameSnapshot
        from hdl_graph_slam_tpu.backend.map_cloud import MapCloudGenerator
        from hdl_graph_slam_tpu.core import cloud as cloudlib

        rng = np.random.default_rng(4)
        snaps = [
            KeyFrameSnapshot(pose=np.eye(4), cloud=cloudlib.from_numpy(rng.uniform(-5, 5, (600, 3)).astype(np.float32), capacity=1024))
            for _ in range(3)
        ]
        m = MapCloudGenerator().generate(snaps, resolution=0.0)
        assert m.shape == (1800, 3)
