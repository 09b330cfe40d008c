"""Round-3 probe #3: why does plane_regularize cost 0.31 ms at (8192,3,3)?

Inputs+outputs are ~0.6 MB => ~1 us of HBM traffic; candidates for the 300x
gap: (a) the (N,3,3) layout pads the minor dims onto lanes, (b) the
arccos/cos lowering, (c) poor fusion of the many small slices. Variants:
- current plane_regularize
- eigvalsh3 alone
- arccos/cos replaced by a Newton solve of 4x^3-3x=r (transcendental-free)
- SoA: six (N,) covariance components in, v_min out
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

    from hdl_graph_slam_tpu.ops.eig3 import eigvalsh3, plane_regularize

    results = []
    rng = np.random.default_rng(0)
    n = 8192
    X = rng.normal(0, 1, (n, 20, 3)).astype(np.float32)
    covs = np.einsum("nki,nkj->nij", X, X) / 20
    covs_j = jnp.asarray(covs)

    dt = timeit(jax.jit(lambda c: plane_regularize(c + 1e-9 * jnp.eye(3, dtype=c.dtype))), covs_j)
    results.append({"metric": "plane_regularize_current_ms", "value": round(dt * 1e3, 3)})

    dt = timeit(jax.jit(eigvalsh3), covs_j)
    results.append({"metric": "eigvalsh3_ms", "value": round(dt * 1e3, 3)})

    # --- SoA variant: all math on (N,) vectors --------------------------------
    def plane_reg_soa(c):
        a00, a11, a22 = c[..., 0, 0], c[..., 1, 1], c[..., 2, 2]
        a01, a02, a12 = c[..., 0, 1], c[..., 0, 2], c[..., 1, 2]
        p1 = a01 * a01 + a02 * a02 + a12 * a12
        q = (a00 + a11 + a22) / 3.0
        d0, d1, d2 = a00 - q, a11 - q, a22 - q
        p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
        p = jnp.sqrt(jnp.clip(p2, 1e-20, None) / 6.0)
        inv_p = 1.0 / p
        b00, b11, b22 = d0 * inv_p, d1 * inv_p, d2 * inv_p
        b01, b02, b12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
        detB = (
            b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02)
        )
        r = jnp.clip(detB / 2.0, -1.0, 1.0)
        # cos(arccos(r)/3) via Newton on 4x^3 - 3x - r = 0 (x in [0.5, 1])
        x = 0.8 + 0.2 * r  # decent init over r in [-1, 1]
        for _ in range(4):
            f = 4 * x * x * x - 3 * x - r
            fp = 12 * x * x - 3
            x = x - f / jnp.where(jnp.abs(fp) < 1e-12, 1e-12, fp)
        cphi = x
        sphi = jnp.sqrt(jnp.clip(1.0 - x * x, 0.0, None))
        lam_min = q + 2.0 * p * (-0.5 * cphi - 0.8660254037844386 * sphi)
        iso = p2 < 1e-18
        lam_min = jnp.where(iso, q, lam_min)
        # eigvec for lam_min: cross products of rows of (A - lam I), SoA
        m00, m11, m22 = a00 - lam_min, a11 - lam_min, a22 - lam_min
        # rows: (m00,a01,a02), (a01,m11,a12), (a02,a12,m22)
        c01x = a01 * a12 - a02 * m11
        c01y = a02 * a01 - m00 * a12
        c01z = m00 * m11 - a01 * a01
        c02x = a01 * m22 - a02 * a12
        c02y = a02 * a02 - m00 * m22
        c02z = m00 * a12 - a01 * a02
        c12x = m11 * m22 - a12 * a12
        c12y = a12 * a02 - a01 * m22
        c12z = a01 * a12 - m11 * a02
        n01 = c01x * c01x + c01y * c01y + c01z * c01z
        n02 = c02x * c02x + c02y * c02y + c02z * c02z
        n12 = c12x * c12x + c12y * c12y + c12z * c12z
        best12 = (n12 >= n01) & (n12 >= n02)
        best02 = (n02 >= n01) & ~best12
        vx = jnp.where(best12, c12x, jnp.where(best02, c02x, c01x))
        vy = jnp.where(best12, c12y, jnp.where(best02, c02y, c01y))
        vz = jnp.where(best12, c12z, jnp.where(best02, c02z, c01z))
        nrm = jnp.sqrt(jnp.clip(vx * vx + vy * vy + vz * vz, 1e-20, None))
        degen = jnp.maximum(jnp.maximum(n01, n02), n12) < 1e-24
        vx = jnp.where(degen, 0.0, vx / nrm)
        vy = jnp.where(degen, 0.0, vy / nrm)
        vz = jnp.where(degen, 1.0, vz / nrm)
        # C_reg = I - (1-eps) v v^T, assembled back to (N, 3, 3)
        w = 1.0 - 1e-3
        r00 = 1.0 - w * vx * vx
        r11 = 1.0 - w * vy * vy
        r22 = 1.0 - w * vz * vz
        r01 = -w * vx * vy
        r02 = -w * vx * vz
        r12 = -w * vy * vz
        row0 = jnp.stack([r00, r01, r02], -1)
        row1 = jnp.stack([r01, r11, r12], -1)
        row2 = jnp.stack([r02, r12, r22], -1)
        return jnp.stack([row0, row1, row2], -2)

    out_soa = jax.jit(plane_reg_soa)(covs_j)
    out_cur = plane_regularize(covs_j + 1e-9 * jnp.eye(3, dtype=covs_j.dtype))
    # compare as projectors (eigvec sign is arbitrary): compare matrices
    diff = float(jnp.max(jnp.abs(out_soa - out_cur)))
    dt = timeit(jax.jit(plane_reg_soa), covs_j)
    results.append({"metric": "plane_reg_soa_newton_ms", "value": round(dt * 1e3, 3), "max_diff": diff})

    # current-form trig but SoA assembly (isolate arccos vs layout)
    def plane_reg_soa_trig(c):
        lam = eigvalsh3(c)[..., 0]
        a00, a11, a22 = c[..., 0, 0], c[..., 1, 1], c[..., 2, 2]
        a01, a02, a12 = c[..., 0, 1], c[..., 0, 2], c[..., 1, 2]
        m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
        c01x = a01 * a12 - a02 * m11
        c01y = a02 * a01 - m00 * a12
        c01z = m00 * m11 - a01 * a01
        c02x = a01 * m22 - a02 * a12
        c02y = a02 * a02 - m00 * m22
        c02z = m00 * a12 - a01 * a02
        c12x = m11 * m22 - a12 * a12
        c12y = a12 * a02 - a01 * m22
        c12z = a01 * a12 - m11 * a02
        n01 = c01x * c01x + c01y * c01y + c01z * c01z
        n02 = c02x * c02x + c02y * c02y + c02z * c02z
        n12 = c12x * c12x + c12y * c12y + c12z * c12z
        best12 = (n12 >= n01) & (n12 >= n02)
        best02 = (n02 >= n01) & ~best12
        vx = jnp.where(best12, c12x, jnp.where(best02, c02x, c01x))
        vy = jnp.where(best12, c12y, jnp.where(best02, c02y, c01y))
        vz = jnp.where(best12, c12z, jnp.where(best02, c02z, c01z))
        nrm = jnp.sqrt(jnp.clip(vx * vx + vy * vy + vz * vz, 1e-20, None))
        degen = jnp.maximum(jnp.maximum(n01, n02), n12) < 1e-24
        vx = jnp.where(degen, 0.0, vx / nrm)
        vy = jnp.where(degen, 0.0, vy / nrm)
        vz = jnp.where(degen, 1.0, vz / nrm)
        w = 1.0 - 1e-3
        row0 = jnp.stack([1.0 - w * vx * vx, -w * vx * vy, -w * vx * vz], -1)
        row1 = jnp.stack([-w * vx * vy, 1.0 - w * vy * vy, -w * vy * vz], -1)
        row2 = jnp.stack([-w * vx * vz, -w * vy * vz, 1.0 - w * vz * vz], -1)
        return jnp.stack([row0, row1, row2], -2)

    diff2 = float(jnp.max(jnp.abs(jax.jit(plane_reg_soa_trig)(covs_j) - out_cur)))
    dt = timeit(jax.jit(plane_reg_soa_trig), covs_j)
    results.append({"metric": "plane_reg_soa_trig_ms", "value": round(dt * 1e3, 3), "max_diff": diff2})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
