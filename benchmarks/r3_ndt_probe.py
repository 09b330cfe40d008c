"""NDT Newton-body stage decomposition on the real chip (round 3).

Times each stage of the DIRECT7 fixed-cells Newton iteration with the
carry-through-the-data discipline (PERF.md "Measurement gotcha #2"): every
probe routes the perturbed source xyz through keys -> lookup -> gather ->
score so nothing hoists out of the timing scan.

Stages probed:
  pack        neighbor_query_keys (floor/div + 7 packs)
  pack+lookup + dense-grid gather of cell indices
  assoc       + combined (V,12) row gather  (== the per-iteration refresh)
  assoc+score + mixture score               (== full_score)
  derivs      score_derivatives given a prebuilt association (gather inside
              to keep the data dependence, subtract `assoc`)
  trials      10 fixed-cell line-search scores given association
  flat        candidate: fused flat-grid-index neighbor lookup (no key
              pack/unpack round trip)
  align       the whole DIRECT7 align (reference point)
"""

from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np

from microbench import timeit


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from hdl_graph_slam_tpu.core import cloud as cloudlib, se3
    from hdl_graph_slam_tpu.ops import voxel as V
    from hdl_graph_slam_tpu.registration import ndt

    results = []
    rng = np.random.default_rng(0)

    n = 8192
    # structured scene (floor + walls) so cells are realistically occupied
    pts = np.concatenate(
        [
            np.stack([rng.uniform(-40, 40, n // 2), rng.uniform(-40, 40, n // 2), rng.normal(0, 0.05, n // 2)], 1),
            np.stack([rng.uniform(-40, 40, n // 2), rng.normal(20, 0.05, n // 2), rng.uniform(0, 5, n // 2)], 1),
        ]
    ).astype(np.float32)
    src = cloudlib.from_numpy(pts, capacity=n)
    tgt_pts = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    tgt_cloud = cloudlib.from_numpy(tgt_pts, capacity=n)
    tgt = ndt.preprocess_target(tgt_cloud, 2.0)
    offsets = V.neighbor_offsets("DIRECT7")
    G = V.grid_dim(tgt.grid)

    def pack_only(xyz):
        keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
        return jnp.sum(keys.astype(jnp.int32))

    def pack_lookup(xyz):
        keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
        idx, found = V.lookup_dense(tgt.grid, keys.reshape(-1), G)
        return jnp.sum(idx) + jnp.sum(found)

    def assoc(xyz):
        keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
        idx, found = V.lookup_dense(tgt.grid, keys.reshape(-1), G)
        idx = idx.reshape(-1, offsets.shape[0])
        means, icovs = ndt._gather_mean_icov(tgt, idx)
        return jnp.sum(means) + jnp.sum(icovs) + jnp.sum(found)

    def assoc_score(xyz):
        keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
        idx, found = V.lookup_dense(tgt.grid, keys.reshape(-1), G)
        K = offsets.shape[0]
        idx, found = idx.reshape(-1, K), found.reshape(-1, K)
        means, icovs = ndt._gather_mean_icov(tgt, idx)
        return ndt._score(tgt, xyz, src.mask, means, icovs, found)

    def derivs_with_assoc(xyz):
        keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
        idx, found = V.lookup_dense(tgt.grid, keys.reshape(-1), G)
        K = offsets.shape[0]
        idx, found = idx.reshape(-1, K), found.reshape(-1, K)
        means, icovs = ndt._gather_mean_icov(tgt, idx)
        g, H, _score = ndt.score_derivatives(tgt.d1, tgt.d2, xyz, src.mask, means, icovs, found)
        return jnp.sum(g) + jnp.sum(H)

    def trials_with_assoc(xyz):
        keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
        idx, found = V.lookup_dense(tgt.grid, keys.reshape(-1), G)
        K = offsets.shape[0]
        idx, found = idx.reshape(-1, K), found.reshape(-1, K)
        means, icovs = ndt._gather_mean_icov(tgt, idx)
        ddir = jnp.full((6,), 1.0 / jnp.sqrt(6.0), xyz.dtype)
        alphas = 0.1 * (0.5 ** jnp.arange(10, dtype=xyz.dtype))

        def trial(alpha):
            T = se3.se3_exp(alpha * ddir)
            moved = se3.transform_points(T, xyz)
            return ndt._score(tgt, moved, src.mask, means, icovs, found)

        return jnp.sum(jax.vmap(trial)(alphas))

    # candidate: fused flat-index neighbor lookup (no key pack/unpack)
    def flat_lookup(xyz):
        rel = V.local_cells(xyz, tgt.voxels.resolution) - tgt.voxels.origin  # (N,3)
        nrel = rel[:, None, :] + offsets[None, :, :]  # (N,K,3)
        ok = jnp.all((nrel >= 0) & (nrel < G), axis=-1) & src.mask[:, None]
        flat = (nrel[..., 0] * G + nrel[..., 1]) * G + nrel[..., 2]
        idx = tgt.grid[jnp.where(ok, flat, 0)]
        found = ok & (idx >= 0)
        idx = jnp.maximum(idx, 0)
        means, icovs = ndt._gather_mean_icov(tgt, idx)
        return jnp.sum(means) + jnp.sum(icovs) + jnp.sum(found)

    xyz = src.xyz
    for name, fn in [
        ("pack", pack_only),
        ("pack_lookup", pack_lookup),
        ("assoc", assoc),
        ("assoc_score", assoc_score),
        ("derivs_incl_assoc", derivs_with_assoc),
        ("trials10_incl_assoc", trials_with_assoc),
        ("flat_assoc", flat_lookup),
    ]:
        dt = timeit(jax.jit(fn), xyz)
        results.append({"metric": f"ndt_stage_{name}_ms", "value": round(dt * 1e3, 3)})
        print(json.dumps(results[-1]), flush=True)

    # whole align for reference
    guess = np.eye(4, dtype=np.float32)
    guess[:3, 3] = [0.3, -0.2, 0.05]
    af = jax.jit(lambda t, s, g: ndt.align(t, s, g, max_iterations=32))
    r = af(tgt, src, jnp.asarray(guess))
    np.asarray(r.error)
    dt = timeit(lambda s_xyz: af(tgt, cloudlib.PointCloud(xyz=s_xyz, mask=src.mask), jnp.asarray(guess)).error, xyz, reps=20)
    results.append({"metric": "ndt_align_direct7_ms", "value": round(dt * 1e3, 3),
                    "iters": int(np.asarray(r.iterations))})
    print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
