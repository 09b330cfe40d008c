"""bf16 distance-matmul for the covariance-kNN selection + Pallas nn1 retry.

The covariance kNN (gicp.preprocess) only needs a ~0.85-recall neighbor SET;
a bf16 x bf16 -> f32 MXU matmul runs at 2x the f32 rate. Measures recall
impact and preprocess time. Also retries the Pallas fused nn1 kernel, which
crashed the remote TPU compiler (HTTP 500) in round 2b.
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
    from hdl_graph_slam_tpu.ops import knn
    from hdl_graph_slam_tpu.registration import gicp

    rng = np.random.default_rng(0)
    n = 8192
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 6, n)
    c = cloudlib.from_numpy(pts, capacity=n)
    xyz = c.valid_xyz()

    # --- selection: f32 vs bf16 matmul --------------------------------------
    def sel_f32(x):
        idx, _ = knn.knn_approx(x, x, 20, recall_target=0.85, exact_dists=False)
        return idx

    def sel_bf16(x):
        chunk = 512
        t_valid = jnp.all(jnp.abs(x) < 1.0e5, axis=-1, keepdims=True)
        lo = jnp.min(jnp.where(t_valid, x, 1.0e5), axis=0)
        hi = jnp.max(jnp.where(t_valid, x, -1.0e5), axis=0)
        center = jnp.where(hi >= lo, 0.5 * (lo + hi), 0.0)
        tc = (x - center).astype(jnp.bfloat16)
        t_norm2 = jnp.sum(tc.astype(jnp.float32) ** 2, axis=-1)

        def one_chunk(qc):
            qcc = (qc - center).astype(jnp.bfloat16)
            d = -2.0 * jax.lax.dot(qcc, tc.T, preferred_element_type=jnp.float32) + t_norm2[None, :]
            _, cand = jax.lax.approx_min_k(d, 20, recall_target=0.85)
            return cand

        return jax.lax.map(one_chunk, x.reshape(-1, chunk, 3)).reshape(-1, 20)

    i32 = np.asarray(jax.jit(sel_f32)(xyz))
    i16 = np.asarray(jax.jit(sel_bf16)(xyz))
    iex = np.asarray(knn.knn(xyz, xyz, 20)[0])
    rec32 = np.mean([len(set(a) & set(b)) / 20.0 for a, b in zip(i32, iex)])
    rec16 = np.mean([len(set(a) & set(b)) / 20.0 for a, b in zip(i16, iex)])
    dt32 = timeit(jax.jit(sel_f32), xyz)
    dt16 = timeit(jax.jit(sel_bf16), xyz)
    print(json.dumps({"metric": "knn_sel_f32_ms", "value": round(dt32 * 1e3, 3), "recall": round(float(rec32), 4)}), flush=True)
    print(json.dumps({"metric": "knn_sel_bf16_ms", "value": round(dt16 * 1e3, 3), "recall": round(float(rec16), 4)}), flush=True)

    # full preprocess for scale
    dt = timeit(jax.jit(lambda cl: gicp.preprocess(cl)), c)
    print(json.dumps({"metric": "gicp_preprocess_ms", "value": round(dt * 1e3, 3)}), flush=True)

    # --- Pallas nn1 retry ----------------------------------------------------
    try:
        from hdl_graph_slam_tpu.ops.pallas_nn import nn1_pallas

        idx_p, d_p = jax.jit(nn1_pallas)(xyz, xyz)
        np.asarray(idx_p)
        dt = timeit(jax.jit(nn1_pallas), xyz, xyz)
        dt_x = timeit(jax.jit(lambda a, b: knn.nn1(a, b)), xyz, xyz)
        print(json.dumps({"metric": "nn1_pallas_ms", "value": round(dt * 1e3, 3),
                          "xla_ms": round(dt_x * 1e3, 3)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"metric": "nn1_pallas_ms", "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
