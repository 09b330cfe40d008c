"""Round-3 probe #2: decompose the voxel-downsample segment machinery.

r3_probe found: keys+sort = 0.26 ms but the full downsample = 1.42 ms, so
~1.16 ms hides in seg_ids / segment_sum / _segment_keys / output assembly.
Candidate replacement: one scatter-min for segment start rows, then cumsum +
boundary gathers for all per-segment sums (gathers are cheap on TPU;
scatter-adds and dependent binary-search gathers are not).
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

    from hdl_graph_slam_tpu.core import cloud as cloudlib
    from hdl_graph_slam_tpu.core.cloud import PAD_COORD, PointCloud
    from hdl_graph_slam_tpu.ops import voxel
    from hdl_graph_slam_tpu.ops.voxel import (
        _INVALID_KEY, _LOCAL_INVALID, _segment_ids_from_sorted_keys, _segment_keys,
        local_cells, local_origin, pack_local_keys, sort_with_order,
    )

    results = []
    rng = np.random.default_rng(0)

    n_raw = 16384
    raw = rng.uniform(-50, 50, (n_raw, 3)).astype(np.float32)
    raw[:, 2] = rng.uniform(0, 4, n_raw)
    c_raw = cloudlib.from_numpy(raw, capacity=n_raw)
    res = 0.2
    MAXV = 8192

    def keys_sorted(cl):
        origin = local_origin(cl.xyz, cl.mask, res)
        keys = pack_local_keys(local_cells(cl.xyz, res), origin, cl.mask)
        return sort_with_order(keys)

    def upto_gather(cl):
        keys_s, order = keys_sorted(cl)
        xyz_s = jnp.where((keys_s != _LOCAL_INVALID)[:, None], cl.xyz[order], 0.0)
        return keys_s, xyz_s

    dt = timeit(jax.jit(upto_gather), c_raw)
    results.append({"metric": "a_sort_plus_gather_ms", "value": round(dt * 1e3, 3)})

    def upto_segids(cl):
        keys_s, xyz_s = upto_gather(cl)
        seg_ids, starts = _segment_ids_from_sorted_keys(keys_s)
        return keys_s, xyz_s, seg_ids

    dt = timeit(jax.jit(upto_segids), c_raw)
    results.append({"metric": "b_plus_segids_ms", "value": round(dt * 1e3, 3)})

    def upto_segsum(cl):
        keys_s, xyz_s, seg_ids = upto_segids(cl)
        valid_s = keys_s != _LOCAL_INVALID
        payload = jnp.concatenate([xyz_s, valid_s.astype(xyz_s.dtype)[:, None]], axis=1)
        acc = jax.ops.segment_sum(payload, seg_ids, num_segments=MAXV, indices_are_sorted=True)
        return acc

    dt = timeit(jax.jit(upto_segsum), c_raw)
    results.append({"metric": "c_plus_segment_sum_ms", "value": round(dt * 1e3, 3)})

    def upto_segkeys(cl):
        keys_s, xyz_s, seg_ids = upto_segids(cl)
        seg_keys = _segment_keys(keys_s, seg_ids, MAXV)
        return seg_keys

    dt = timeit(jax.jit(upto_segkeys), c_raw)
    results.append({"metric": "d_sort_to_segkeys_searchsorted_ms", "value": round(dt * 1e3, 3)})

    dt = timeit(jax.jit(lambda cl: voxel.voxel_downsample_local(cl, res, max_voxels=MAXV)), c_raw)
    results.append({"metric": "e_full_current_ms", "value": round(dt * 1e3, 3)})

    # --- candidate: scatter-min starts + cumsum boundary sums -----------------
    def downsample_cumsum(cl):
        keys_s, order = keys_sorted(cl)
        valid_s = keys_s != _LOCAL_INVALID
        xyz_s = jnp.where(valid_s[:, None], cl.xyz[order], 0.0)
        seg_ids, starts = _segment_ids_from_sorted_keys(keys_s)
        n = keys_s.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        # start row of each segment: one scatter-min (16k int32)
        start_idx = jnp.full((MAXV + 1,), jnp.int32(n), jnp.int32)
        start_idx = start_idx.at[jnp.minimum(seg_ids, MAXV)].min(iota)
        # segment v occupies [start_idx[v], next_start[v]) — next start via
        # a suffix min (start_idx is ascending for live segments, n for dead)
        start = start_idx[:MAXV]
        nxt = jnp.minimum.accumulate(start_idx[::-1])[::-1]
        end = nxt[1:]
        counts = jnp.maximum(end - start, 0)
        payload = jnp.concatenate([xyz_s, valid_s.astype(xyz_s.dtype)[:, None]], axis=1)
        csum = jnp.cumsum(payload, axis=0)
        z = jnp.zeros((1, payload.shape[1]), payload.dtype)
        csum0 = jnp.concatenate([z, csum], axis=0)  # csum0[i] = sum of rows < i
        sums = csum0[jnp.minimum(end, n)] - csum0[jnp.minimum(start, n)]
        seg_keys = keys_s[jnp.clip(start, 0, n - 1)]
        out_mask = (counts > 0) & (seg_keys != _LOCAL_INVALID) & (sums[:, 3] > 0)
        centroids = sums[:, :3] / jnp.clip(sums[:, 3:4], 1.0, None)
        centroids = jnp.where(out_mask[:, None], centroids, PAD_COORD)
        return PointCloud(xyz=centroids, mask=out_mask)

    out_new = jax.jit(downsample_cumsum)(c_raw)
    out_old = voxel.voxel_downsample_local(c_raw, res, max_voxels=MAXV)
    eq_mask = bool(jnp.all(out_new.mask == out_old.mask))
    eq_xyz = float(jnp.max(jnp.abs(jnp.where(out_old.mask[:, None], out_new.xyz - out_old.xyz, 0.0))))
    dt = timeit(jax.jit(downsample_cumsum), c_raw)
    results.append({"metric": "f_candidate_cumsum_ms", "value": round(dt * 1e3, 3),
                    "mask_equal": eq_mask, "max_xyz_diff": eq_xyz})

    # --- how expensive is the scatter-min alone? ------------------------------
    def scatter_min_only(cl):
        keys_s, order = keys_sorted(cl)
        seg_ids, _ = _segment_ids_from_sorted_keys(keys_s)
        n = keys_s.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        start_idx = jnp.full((MAXV + 1,), jnp.int32(n), jnp.int32)
        return start_idx.at[jnp.minimum(seg_ids, MAXV)].min(iota)

    dt = timeit(jax.jit(scatter_min_only), c_raw)
    results.append({"metric": "g_sort_to_scattermin_ms", "value": round(dt * 1e3, 3)})

    # --- gicp.preprocess internals --------------------------------------------
    from hdl_graph_slam_tpu.ops import knn
    from hdl_graph_slam_tpu.ops.eig3 import plane_regularize

    n = 8192
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    xyz = jnp.asarray(pts)

    def cov_only(a):
        idx, _ = knn.knn_approx(a, a, 20, recall_target=0.9, exact_dists=False)
        nbrs = a[idx]
        mean = jnp.mean(nbrs, axis=1, keepdims=True)
        centered = nbrs - mean
        return jnp.einsum("nki,nkj->nij", centered, centered) / 20

    dt = timeit(jax.jit(cov_only), xyz)
    results.append({"metric": "h_sel_gather_cov_ms", "value": round(dt * 1e3, 3)})

    covs = jax.jit(cov_only)(xyz)
    dt = timeit(jax.jit(lambda c: plane_regularize(c + 1e-9 * jnp.eye(3, dtype=c.dtype))), covs)
    results.append({"metric": "i_plane_regularize_ms", "value": round(dt * 1e3, 3)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
