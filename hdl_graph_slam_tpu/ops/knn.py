"""Brute-force exact nearest-neighbor search on the MXU.

The reference leans on pcl::search::KdTree everywhere (GICP covariances,
fitness scores, statistical outlier removal, normal estimation — SURVEY.md
§2.2). Pointer-chasing kd-trees are hostile to TPUs; at post-voxel-filter
LiDAR sizes (5-30k points) the TPU-native choice is a *tiled brute-force
distance matrix*: ||q - t||^2 = ||q||^2 - 2 q.t + ||t||^2, whose dominant
term is a matmul that maps straight onto the MXU. 20k x 20k x 3 is ~2.4
GFLOP - microseconds-scale on a TPU chip, and exact (no kd-tree approximation
gap to worry about for loop-gate fitness parity).

Precision: the expanded form loses ~1e-3 m^2 at 100 m scale in f32, so we
re-rank the top-2 candidates with the exact difference form; returned
distances are always computed exactly.

Padding: padded target points sit at PAD_COORD (1e6), so they can never win
an argmin against any real point.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Distance-matmul precision (round-5, see the package __init__ policy):
# - nn1/knn SELECT behavior (correspondences, fitness) — pinned HIGH
#   (bf16_3x): argmin agreement vs true f32 is 0.9993 (near-ties only,
#   rel err ~2e-5 — an equidistant swap is invisible to the LM cost),
#   while the MXU's bf16 DEFAULT mis-selects ~24% of 1-NNs (round-4
#   post-mortem). Pinning keeps the exactness contract even if a user
#   lowers the global flag.
# - knn_approx also runs at HIGH. A round-5 attempt to run its selection
#   matmul at DEFAULT (one bf16 pass; +21 fps on the headline) was
#   REVERTED by the golden course: at 60 m target-centered coordinates the
#   bf16 cross-term noise is ~0.4% of |q||t| ~ +/-14 m^2 on d^2 values
#   that differ by ~0.1 m^2 between true neighbors, so the covariance
#   neighbor SETS are noise-contaminated — GICP's surface covariances
#   blur toward blobs and odometry ATE on the 2-lap corner course
#   degraded 0.085 -> 3.96 m (the straight-drive headline's <3% gate
#   never noticed; golden_town did). "It's already approximate" does not
#   license MORE noise: approx_min_k's 0.85 recall is against the TRUE
#   distance ordering.
_SEL_HIGH = jax.lax.Precision.HIGH
_SEL_FAST = jax.lax.Precision.HIGH


def _pad_rows(x, multiple, fill):
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad_width = ((0, rem),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


@partial(jax.jit, static_argnames=("chunk",))
def nn1(query: jax.Array, target: jax.Array, chunk: int = 512) -> Tuple[jax.Array, jax.Array]:
    """Exact 1-NN: for each query point the index of the closest target point
    and the exact squared distance. query (N,3), target (M,3) -> (N,), (N,).

    Both inputs should use PAD_COORD sentinels for invalid rows.
    """
    n = query.shape[0]
    q = _pad_rows(query, chunk, 0.0)
    # center on the target's bounding-box midpoint: shrinks |coords| so the
    # expanded-form f32 cancellation error stays well below typical
    # inter-point spacing (selection exactness), shift-invariant otherwise
    t_valid = jnp.all(jnp.abs(target) < 1.0e5, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(t_valid, target, 1.0e5), axis=0)
    hi = jnp.max(jnp.where(t_valid, target, -1.0e5), axis=0)
    center = jnp.where(hi >= lo, 0.5 * (lo + hi), 0.0)
    tc = target - center
    t_norm2 = jnp.sum(tc * tc, axis=-1)

    def one_chunk(qc):
        qcc = qc - center
        # (chunk, M) distances via the MXU-friendly expansion; a plain
        # min/argmin reduce beats top_k by a wide margin on TPU. The argmin
        # is spelled as min + int32-iota select so the index stays int32
        # even under x64 (jnp.argmin would emit emulated-int64 indices).
        d = -2.0 * jnp.matmul(qcc, tc.T, precision=_SEL_HIGH) + t_norm2[None, :]
        dmin = jnp.min(d, axis=-1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, dimension=1)
        idx = jnp.min(jnp.where(d <= dmin, cols, jnp.int32(2**30)), axis=-1)
        # exact squared distance for the selected neighbor
        diff = qc - target[idx]
        dist2 = jnp.sum(diff * diff, axis=-1)
        return idx, dist2

    qc = q.reshape(-1, chunk, 3)
    idx, dist2 = jax.lax.map(one_chunk, qc)
    return idx.reshape(-1)[:n], dist2.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query: jax.Array, target: jax.Array, k: int, chunk: int = 256) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN indices and exact squared distances.

    query (N,3), target (M,3) -> idx (N,k) int32, dist2 (N,k) ascending.
    """
    n = query.shape[0]
    q = _pad_rows(query, chunk, 0.0)
    # same bbox-centering as nn1/knn_approx: candidate *selection* must not
    # lose a true neighbor to f32 cancellation at map-frame coordinates
    t_valid = jnp.all(jnp.abs(target) < 1.0e5, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(t_valid, target, 1.0e5), axis=0)
    hi = jnp.max(jnp.where(t_valid, target, -1.0e5), axis=0)
    center = jnp.where(hi >= lo, 0.5 * (lo + hi), 0.0)
    tc = target - center
    t_norm2 = jnp.sum(tc * tc, axis=-1)

    def one_chunk(qc):
        qcc = qc - center
        d = -2.0 * jnp.matmul(qcc, tc.T, precision=_SEL_HIGH) + t_norm2[None, :]
        neg_d, cand = jax.lax.top_k(-d, k)  # (chunk, k)
        diff = qc[:, None, :] - target[cand]
        d_exact = jnp.sum(diff * diff, axis=-1)
        order = jnp.argsort(d_exact, axis=-1)
        return jnp.take_along_axis(cand, order, axis=-1), jnp.take_along_axis(d_exact, order, axis=-1)

    qc = q.reshape(-1, chunk, 3)
    idx, dist2 = jax.lax.map(one_chunk, qc)
    return idx.reshape(-1, k)[:n], dist2.reshape(-1, k)[:n]


@partial(jax.jit, static_argnames=("k", "chunk", "recall_target", "exact_dists"))
def knn_approx(
    query: jax.Array,
    target: jax.Array,
    k: int,
    chunk: int = 512,
    recall_target: float = 0.95,
    exact_dists: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """k-NN via the TPU-accelerated partial reduction jax.lax.approx_min_k.

    Used where a ~0.95-recall neighbor set is statistically equivalent to
    the exact one — GICP covariance estimation over k=20 neighbors (the
    covariances are plane-regularized afterwards, so a occasionally swapped
    20th neighbor is invisible). Exact k-NN (knn) remains the default for
    anything that gates behavior (fitness scores, correspondences).

    exact_dists=True: returns idx (N,k), exact squared distances ascending.
    exact_dists=False: returns the neighbor set with *approximate* squared
    distances in approx_min_k's bin order (not exactly sorted). The exact
    rescore (gather + argsort) costs ~2.7x the selection itself on TPU —
    skip it when the consumer only needs the neighbor SET (covariance
    estimation: mean/outer-product are permutation-invariant).
    """
    n = query.shape[0]
    q = _pad_rows(query, chunk, 0.0)
    t_valid = jnp.all(jnp.abs(target) < 1.0e5, axis=-1, keepdims=True)
    lo = jnp.min(jnp.where(t_valid, target, 1.0e5), axis=0)
    hi = jnp.max(jnp.where(t_valid, target, -1.0e5), axis=0)
    center = jnp.where(hi >= lo, 0.5 * (lo + hi), 0.0)
    tc = target - center
    t_norm2 = jnp.sum(tc * tc, axis=-1)

    def one_chunk(qc):
        qcc = qc - center
        d = -2.0 * jnp.matmul(qcc, tc.T, precision=_SEL_FAST) + t_norm2[None, :]
        dk, cand = jax.lax.approx_min_k(d, k, recall_target=recall_target)
        if not exact_dists:
            # recover approximate squared distance: d lacks the |q|^2 term
            return cand, dk + jnp.sum(qcc * qcc, axis=-1, keepdims=True)
        diff = qc[:, None, :] - target[cand]
        d_exact = jnp.sum(diff * diff, axis=-1)
        order = jnp.argsort(d_exact, axis=-1)
        return jnp.take_along_axis(cand, order, axis=-1), jnp.take_along_axis(d_exact, order, axis=-1)

    qc = q.reshape(-1, chunk, 3)
    idx, dist2 = jax.lax.map(one_chunk, qc)
    return idx.reshape(-1, k)[:n], dist2.reshape(-1, k)[:n]


@partial(jax.jit, static_argnames=("chunk",))
def radius_count(query: jax.Array, target: jax.Array, radius, chunk: int = 512) -> jax.Array:
    """Number of target points strictly within ``radius`` of each query point,
    *including* an exact-coincidence/self match (PCL's radiusSearch counts the
    query point itself when the clouds coincide). (N,3),(M,3) -> (N,) int32.
    """
    n = query.shape[0]
    q = _pad_rows(query, chunk, jnp.inf)
    r2 = radius * radius
    t_norm2 = jnp.sum(target * target, axis=-1)

    def one_chunk(qc):
        q_norm2 = jnp.sum(qc * qc, axis=-1)
        d = q_norm2[:, None] - 2.0 * (qc @ target.T) + t_norm2[None, :]
        return jnp.sum(d < r2, axis=-1).astype(jnp.int32)

    qc = q.reshape(-1, chunk, 3)
    counts = jax.lax.map(one_chunk, qc)
    return counts.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("max_range",))
def fitness_score(
    target_xyz: jax.Array,
    source_xyz: jax.Array,
    source_mask: jax.Array,
    relpose: jax.Array,
    max_range: float = jnp.inf,
) -> jax.Array:
    """PCL getFitnessScore / InformationMatrixCalculator::calc_fitness_score
    (src/hdl_graph_slam/information_matrix_calculator.cpp:49-80): transform
    ``source`` by ``relpose``, mean squared 1-NN distance into ``target`` over
    matches with dist <= max_range; +inf when no point matches.
    """
    R = relpose[:3, :3]
    t = relpose[:3, 3]
    moved = source_xyz @ R.T + t
    moved = jnp.where(source_mask[:, None], moved, 1.0e6)
    _, d2 = nn1(moved, target_xyz)
    ok = source_mask & (d2 <= max_range)
    nr = jnp.sum(ok)
    total = jnp.sum(jnp.where(ok, d2, 0.0))
    return jnp.where(nr > 0, total / jnp.clip(nr, 1, None), jnp.inf)
