"""Round-3 optimization probes (run on the real chip).

Levers under test, each vs its current implementation:
- nn1: VMEM-tiled running-min over target tiles (avoid materializing the
  (N, M) distance matrix to HBM) vs the current chunked full-row reduce.
- voxel downsample: where does the 1.4 ms go (sort vs segment machinery)?
- gicp.preprocess: approx_min_k recall 0.85 vs 0.9.
"""

from __future__ import annotations
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
from functools import partial

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
    from hdl_graph_slam_tpu.ops import knn, voxel

    results = []
    rng = np.random.default_rng(0)

    n = 8192
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts2 = pts + rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    xyz = jnp.asarray(pts)
    t_xyz = jnp.asarray(pts2)

    # --- baseline nn1 ---------------------------------------------------------
    dt = timeit(jax.jit(lambda a, b: knn.nn1(a, b)), xyz, t_xyz)
    results.append({"metric": "nn1_current_ms", "value": round(dt * 1e3, 3)})

    # --- tiled nn1: running min over target tiles inside a scan ---------------
    @partial(jax.jit, static_argnames=("qchunk", "ttile"))
    def nn1_tiled(query, target, qchunk=1024, ttile=2048):
        nq = query.shape[0]
        t_valid = jnp.all(jnp.abs(target) < 1.0e5, axis=-1, keepdims=True)
        lo = jnp.min(jnp.where(t_valid, target, 1.0e5), axis=0)
        hi = jnp.max(jnp.where(t_valid, target, -1.0e5), axis=0)
        center = jnp.where(hi >= lo, 0.5 * (lo + hi), 0.0)
        tc = target - center
        t_norm2 = jnp.sum(tc * tc, axis=-1)
        n_tiles = tc.shape[0] // ttile
        tc_t = tc.reshape(n_tiles, ttile, 3)
        tn_t = t_norm2.reshape(n_tiles, ttile)

        def one_chunk(qc):
            qcc = qc - center

            def tile_step(carry, tile):
                dmin, imin = carry
                tcc, tnn, base = tile
                d = -2.0 * (qcc @ tcc.T) + tnn[None, :]
                dt_min = jnp.min(d, axis=-1)
                cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
                it_min = jnp.min(jnp.where(d <= dt_min[:, None], cols, jnp.int32(2**30)), axis=-1) + base
                better = dt_min < dmin
                return (jnp.where(better, dt_min, dmin), jnp.where(better, it_min, imin)), None

            bases = (ttile * jnp.arange(n_tiles, dtype=jnp.int32))
            init = (jnp.full((qchunk,), jnp.inf, qc.dtype), jnp.zeros((qchunk,), jnp.int32))
            (dmin, imin), _ = jax.lax.scan(tile_step, init, (tc_t, tn_t, bases))
            diff = qc - target[imin]
            return imin, jnp.sum(diff * diff, axis=-1)

        qc = query.reshape(-1, qchunk, 3)
        idx, dist2 = jax.lax.map(one_chunk, qc)
        return idx.reshape(-1)[:nq], dist2.reshape(-1)[:nq]

    for qchunk, ttile in ((1024, 2048), (2048, 2048), (8192, 2048), (8192, 1024), (512, 4096)):
        fn = partial(nn1_tiled, qchunk=qchunk, ttile=ttile)
        i_t, d_t = fn(xyz, t_xyz)
        i_x, d_x = knn.nn1(xyz, t_xyz)
        agree = float(jnp.mean((d_t == d_x).astype(jnp.float32)))
        dt = timeit(jax.jit(fn), xyz, t_xyz)
        results.append({"metric": f"nn1_tiled_q{qchunk}_t{ttile}_ms", "value": round(dt * 1e3, 3), "agree": agree})

    # --- bigger chunk for current nn1 ---------------------------------------
    for chunk in (1024, 2048, 8192):
        dt = timeit(jax.jit(lambda a, b, _c=chunk: knn.nn1(a, b, chunk=_c)), xyz, t_xyz)
        results.append({"metric": f"nn1_current_chunk{chunk}_ms", "value": round(dt * 1e3, 3)})

    # --- voxel downsample decomposition --------------------------------------
    n_raw = 16384
    raw = rng.uniform(-50, 50, (n_raw, 3)).astype(np.float32)
    raw[:, 2] = rng.uniform(0, 4, n_raw)
    c_raw = cloudlib.from_numpy(raw, capacity=n_raw)
    mask = c_raw.mask

    def keys_only(cl):
        origin = voxel.local_origin(cl.xyz, cl.mask, 0.2)
        return voxel.pack_local_keys(voxel.local_cells(cl.xyz, 0.2), origin, cl.mask)

    dt = timeit(jax.jit(keys_only), c_raw)
    results.append({"metric": "voxel_keys_16k_ms", "value": round(dt * 1e3, 3)})

    def keys_sorted(cl):
        k = keys_only(cl)
        return voxel.sort_with_order(k)

    dt = timeit(jax.jit(keys_sorted), c_raw)
    results.append({"metric": "voxel_keys_sort_16k_ms", "value": round(dt * 1e3, 3)})

    def sort_only_keys(cl):
        k = keys_only(cl)
        return jnp.sort(k)

    dt = timeit(jax.jit(sort_only_keys), c_raw)
    results.append({"metric": "voxel_sort_nopayload_16k_ms", "value": round(dt * 1e3, 3)})

    dt = timeit(jax.jit(lambda cl: voxel.voxel_downsample_local(cl, 0.2, max_voxels=8192)), c_raw)
    results.append({"metric": "voxel_downsample_full_16k_ms", "value": round(dt * 1e3, 3)})

    # --- preprocess recall variants -------------------------------------------
    from hdl_graph_slam_tpu.registration import gicp

    c8 = cloudlib.from_numpy(pts, capacity=n)
    for r in (0.9, 0.85, 0.8):
        fn = jax.jit(lambda a, _r=r: knn.knn_approx(a, a, 20, recall_target=_r, exact_dists=False))
        dt = timeit(fn, xyz)
        results.append({"metric": f"knn_approx_sel_r{r}_ms", "value": round(dt * 1e3, 3)})
    dt = timeit(jax.jit(lambda cl: gicp.preprocess(cl)), c8)
    results.append({"metric": "gicp_preprocess_ms", "value": round(dt * 1e3, 3)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
