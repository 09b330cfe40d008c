"""Pallas TPU kernel: fused brute-force 1-NN (distance matmul + argmin).

The XLA path (ops/knn.py nn1) materializes chunk x M distance tiles in HBM
between the matmul and the argmin reduce; this kernel keeps each (TQ, TM)
distance tile in VMEM and carries the running (min, argmin) across target
tiles in the revisited output block — HBM traffic drops from O(N*M) to
O(N + M) per query tile row. Grid: (query_tiles, target_tiles), target
innermost so the output block accumulates across the sweep (canonical TPU
revisiting pattern).

Layout: the distance expansion is folded into ONE MXU matmul by augmenting
the coordinates — query rows are [qx, qy, qz, 1, 0, 0, 0, 0] and target
columns are [-2*tx, -2*ty, -2*tz, |t|^2, 0, 0, 0, 0]^T, so
dot(q_aug, t_aug) = |t|^2 - 2 q.t (the |q|^2 term is argmin-invariant).
The 8-row contraction dim keeps every block shape at TPU-native tile
multiples (f32 sublane 8 / lane 128) — narrower 3-row blocks crashed the
remote TPU compiler.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_TQ = 256  # query rows per program
_TM = 2048  # target cols per program


def _nn_kernel(q_ref, t_ref, bd_ref, bi_ref):
    j = pl.program_id(1)
    q = q_ref[:, :]  # (TQ, 8) augmented query
    t = t_ref[:, :]  # (8, TM) augmented target
    d = jnp.dot(q, t, preferred_element_type=jnp.float32)  # (TQ, TM) = |t|^2 - 2 q.t
    local_min = jnp.min(d, axis=1)  # (TQ,)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)
    big = jnp.int32(2**30)
    local_arg = jnp.min(jnp.where(d <= local_min[:, None], cols, big), axis=1) + j * _TM

    # outputs carry a dummy 8-row sublane dim (TPU min tile); broadcast-write
    @pl.when(j == 0)
    def _():
        bd_ref[:, :] = jnp.broadcast_to(local_min[None, :], bd_ref.shape)
        bi_ref[:, :] = jnp.broadcast_to(local_arg[None, :], bi_ref.shape)

    @pl.when(j > 0)
    def _():
        prev_d = bd_ref[0, :]
        prev_i = bi_ref[0, :]
        take = local_min < prev_d
        new_d = jnp.where(take, local_min, prev_d)
        new_i = jnp.where(take, local_arg, prev_i)
        bd_ref[:, :] = jnp.broadcast_to(new_d[None, :], bd_ref.shape)
        bi_ref[:, :] = jnp.broadcast_to(new_i[None, :], bi_ref.shape)


@partial(jax.jit, static_argnames=("interpret",))
def nn1_pallas(query: jax.Array, target: jax.Array, interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Exact 1-NN indices + exact squared distances via the fused kernel.

    query (N,3), target (M,3) float32; N, M padded internally to tile
    multiples (sentinel-padded so padding never wins).
    """
    n = query.shape[0]
    m = target.shape[0]

    # center on the valid target bbox (f32 cancellation control, see knn.nn1)
    t_valid = jnp.all(jnp.abs(target) < 1.0e5, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(t_valid, target, 1.0e5), axis=0)
    hi = jnp.max(jnp.where(t_valid, target, -1.0e5), axis=0)
    center = jnp.where(hi >= lo, 0.5 * (lo + hi), 0.0)

    n_pad = (-n) % _TQ
    m_pad = (-m) % _TM
    qc = jnp.pad(query - center, ((0, n_pad), (0, 0)))
    tc = jnp.pad(target - center, ((0, m_pad), (0, 0)), constant_values=2.0e6)

    # augmented 8-row layout: one MXU matmul produces |t|^2 - 2 q.t
    nq = qc.shape[0]
    mq = tc.shape[0]
    q_aug = jnp.concatenate(
        [qc, jnp.ones((nq, 1), jnp.float32), jnp.zeros((nq, 4), jnp.float32)], axis=1
    )
    tn = jnp.sum(tc * tc, axis=-1)
    t_aug = jnp.concatenate(
        [-2.0 * tc.T, tn[None, :], jnp.zeros((4, mq), jnp.float32)], axis=0
    )

    n_q_tiles = nq // _TQ
    n_t_tiles = mq // _TM

    bd, bi = pl.pallas_call(
        _nn_kernel,
        grid=(n_q_tiles, n_t_tiles),
        in_specs=[
            pl.BlockSpec((_TQ, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((8, _TM), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((8, _TQ), lambda i, j: (0, i)),
            pl.BlockSpec((8, _TQ), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_q_tiles * _TQ), jnp.float32),
            jax.ShapeDtypeStruct((8, n_q_tiles * _TQ), jnp.int32),
        ],
        interpret=interpret,
    )(q_aug, t_aug)

    idx = bi[0, :n]
    idx = jnp.clip(idx, 0, m - 1)
    diff = query - target[idx]
    dist2 = jnp.sum(diff * diff, axis=-1)
    return idx, dist2
