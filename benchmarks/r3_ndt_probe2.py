"""Dense-grid lookup cost vs grid size and payload dtype (round 3).

The r3_ndt_probe stage decomposition showed the 256^3 int32 grid gather
(~57k random 4-byte loads from a 64 MB table) costing ~0.88 ms of the
~1.35 ms per-iteration association. This probes whether the cost is
table-size-bound (smaller G) or payload-bound (int16 rows).
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
    from hdl_graph_slam_tpu.ops import voxel as V
    from hdl_graph_slam_tpu.registration import ndt

    rng = np.random.default_rng(0)
    n = 8192
    pts = np.concatenate(
        [
            np.stack([rng.uniform(-40, 40, n // 2), rng.uniform(-40, 40, n // 2), rng.normal(0, 0.05, n // 2)], 1),
            np.stack([rng.uniform(-40, 40, n // 2), rng.normal(20, 0.05, n // 2), rng.uniform(0, 5, n // 2)], 1),
        ]
    ).astype(np.float32)
    src = cloudlib.from_numpy(pts, capacity=n)
    tgt_cloud = cloudlib.from_numpy((pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32), capacity=n)
    offsets = V.neighbor_offsets("DIRECT7")

    for G in (64, 128, 256):
        tgt = ndt.preprocess_target(tgt_cloud, 2.0, grid_size=G)

        def assoc(xyz, tgt=tgt, G=G):
            keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
            idx, found = V.lookup_dense(tgt.grid, keys.reshape(-1), G)
            idx = idx.reshape(-1, offsets.shape[0])
            means, icovs = ndt._gather_mean_icov(tgt, idx)
            return jnp.sum(means) + jnp.sum(icovs) + jnp.sum(found)

        dt = timeit(jax.jit(assoc), src.xyz)
        print(json.dumps({"metric": f"assoc_G{G}_int32_ms", "value": round(dt * 1e3, 3)}), flush=True)

        # int16 grid payload variant (V <= 32767 rows always fits)
        grid16 = jnp.where(tgt.grid >= 0, tgt.grid, -1).astype(jnp.int16)

        def assoc16(xyz, tgt=tgt, grid16=grid16, G=G):
            keys = V.neighbor_query_keys(tgt.voxels, xyz, src.mask, offsets)
            i = keys >> 20
            j = (keys >> 10) & 1023
            k = keys & 1023
            in_g = (keys != np.iinfo(np.int32).max) & (i < G) & (j < G) & (k < G)
            flat = jnp.where(in_g, (i * G + j) * G + k, 0)
            idx = grid16[flat.reshape(-1)].astype(jnp.int32)
            found = in_g.reshape(-1) & (idx >= 0)
            idx = jnp.maximum(idx, 0).reshape(-1, offsets.shape[0])
            means, icovs = ndt._gather_mean_icov(tgt, idx)
            return jnp.sum(means) + jnp.sum(icovs) + jnp.sum(found)

        dt = timeit(jax.jit(assoc16), src.xyz)
        print(json.dumps({"metric": f"assoc_G{G}_int16_ms", "value": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
