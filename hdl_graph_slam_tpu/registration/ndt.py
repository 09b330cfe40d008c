"""NDT (Normal Distributions Transform) with pclomp semantics, TPU-native.

Reference usage: src/hdl_graph_slam/registrations.cpp:100-121
(pclomp::NormalDistributionsTransform with reg_resolution, DIRECT7/DIRECT1
neighborhood search, transformation_epsilon, max_iterations).

Algorithm (Magnusson 2009 / PCL NDT):
- target voxelized into Gaussian cells (mean + regularized covariance,
  min 6 points per cell — ops/voxel.build_gaussian_voxels);
- mixture score per transformed source point over the DIRECT7 neighbor
  cells: -d1 * exp(-d2/2 * q^T S^-1 q), with d1/d2 from outlier_ratio 0.55;
- Newton iterations on the 6-dof pose, step length bounded by step_size
  (PCL default 0.1) via line search.

TPU mapping: DIRECT voxel lookup is a searchsorted binary search over the
sorted int32 local-key table; KDTREE mode (pclomp radiusSearch over cell
centroids, registrations.cpp:108-112) is a brute-force MXU k-NN over the
cell means gated at radius=resolution; gradient and Hessian are closed-form
(score_derivatives) on the left-multiplied twist at zero; the More-Thuente
line search becomes a *parallel* line search — all candidate step lengths
are scored in one batched evaluation and the best is selected.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.cloud import PointCloud
from ..ops import voxel as voxelops
from .base import AlignResult


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NdtTarget:
    voxels: voxelops.GaussianVoxels
    icovs: jax.Array  # (V, 3, 3) inverse cell covariances
    d1: jax.Array
    d2: jax.Array
    # flat (G^3,) dense cell->row grid for O(1) DIRECT lookup (ndt_omp's
    # getNeighborhoodAtPoint* is direct grid indexing too); None falls back
    # to the sorted-key binary search. See ops/voxel.py build_dense_grid.
    grid: jax.Array | None = None
    # (V, 12) [mean | icov.flat] — the align loop gathers ONE combined row
    # per neighbor cell instead of separate means/icovs gathers (TPU gathers
    # are latency-bound per row, so halving the gather count halves that
    # cost); built lazily for loaded/legacy targets.
    cell_rows: jax.Array | None = None


@partial(jax.jit, static_argnames=("max_voxels", "grid_size"))
def preprocess_target(
    cloud: PointCloud,
    resolution,
    max_voxels: int = 8192,
    outlier_ratio=0.55,
    grid_size: int = voxelops.DENSE_GRID_SIZE,
) -> NdtTarget:
    """Build the Gaussian cell grid + mixture constants (PCL NDT init).

    grid_size > 0 additionally builds the flat (grid_size^3,) dense lookup
    grid — one gather per cell query in the align loop instead of log2(V)
    dependent binary-search gathers (~5.6 ms/iteration at 8k pts on TPU).
    Cells beyond grid_size*resolution meters from the target's min occupied
    cell are unreachable through it (reported not-found, like the 1024^3
    local-grid bound); pass grid_size=0 for the search-based exact path.
    """
    from .gicp import _inv3x3  # closed-form batched 3x3 inverse (no LAPACK LU)

    gv = voxelops.build_gaussian_voxels(cloud, resolution, max_voxels, min_points=6, regularize="ndt")
    grid = voxelops.build_dense_grid(gv.keys, gv.mask, grid_size) if grid_size else None
    icovs = _inv3x3(gv.covs + 1e-6 * jnp.eye(3, dtype=gv.covs.dtype))
    icovs = jnp.where(gv.mask[:, None, None], icovs, 0.0)
    # PCL NormalDistributionsTransform::init gaussian mixture constants
    res = jnp.asarray(resolution, dtype=cloud.xyz.dtype)
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / (res**3)
    d3 = -jnp.log(c2)
    d1 = -jnp.log(c1 + c2) - d3
    d2 = -2.0 * jnp.log((-jnp.log(c1 * jnp.exp(-0.5) + c2) - d3) / d1)
    cell_rows = jnp.concatenate([gv.means, icovs.reshape(-1, 9)], axis=1)
    return NdtTarget(voxels=gv, icovs=icovs, d1=d1, d2=d2, grid=grid, cell_rows=cell_rows)


def _gather_mean_icov(tgt: NdtTarget, idx: jax.Array):
    """(means, icovs) for an (N, K) cell-index array via ONE combined-row
    gather when the target carries cell_rows (half the gather latency of
    separate means/icovs gathers), else the two-table fallback."""
    if tgt.cell_rows is None:
        return tgt.voxels.means[idx], tgt.icovs[idx]
    rows = tgt.cell_rows[idx]  # (..., 12)
    return rows[..., :3], rows[..., 3:].reshape(idx.shape + (3, 3))


def _gather_cells(tgt: NdtTarget, pts: jax.Array, mask: jax.Array, offsets: jax.Array):
    """For each point: indices+found flags of its neighbor cells (N, K).

    One dense-grid gather per cell when the target carries a grid, else the
    int32 local-key binary search (ops/voxel.py) — native int32 either way,
    no x64 in the align loop."""
    nkeys = voxelops.neighbor_query_keys(tgt.voxels, pts, mask, offsets)  # (N, K)
    if tgt.grid is not None:
        idx, found = voxelops.lookup_dense(tgt.grid, nkeys.reshape(-1), voxelops.grid_dim(tgt.grid))
    else:
        idx, found = voxelops.lookup_voxels(tgt.voxels, nkeys.reshape(-1))
    K = offsets.shape[0]
    return idx.reshape(-1, K), found.reshape(-1, K)


_KDTREE_MAX_CELLS = 8


def _gather_cells_kdtree(tgt: NdtTarget, pts: jax.Array, mask: jax.Array):
    """KDTREE neighbor mode (pclomp NeighborSearchMethod::KDTREE,
    ndt_omp radiusSearch over the cell-*centroid* kd-tree with
    radius=resolution, registrations.cpp:108-112): for each point, the cells
    whose MEAN lies within ``resolution`` — found by MXU brute-force k-NN
    over the V cell means (V ~ thousands: one small matmul), capped at
    _KDTREE_MAX_CELLS candidates per point (a resolution-radius ball around
    a point rarely contains more than ~7 cell centroids)."""
    from ..ops import knn as knnops

    means_q = jnp.where(tgt.voxels.mask[:, None], tgt.voxels.means, 1.0e6)
    pts_q = jnp.where(mask[:, None], pts, 1.0e6)
    idx, d2 = knnops.knn_approx(pts_q, means_q, _KDTREE_MAX_CELLS)
    res2 = tgt.voxels.resolution * tgt.voxels.resolution
    found = mask[:, None] & tgt.voxels.mask[idx] & (d2 <= res2)
    return idx, found


def _score(tgt: NdtTarget, moved: jax.Array, mask: jax.Array, means, icovs, found):
    """Negative NDT score (to minimize): sum_i sum_k d1 exp(-d2/2 q M q).

    d1 < 0, so each found cell contributes a negative value; fewer/worse
    matches -> score closer to 0.
    """
    q = moved[:, None, :] - means  # (N, K, 3)
    md = jnp.einsum("nki,nkij,nkj->nk", q, icovs, q)
    # a Mahalanobis form is >= 0 for any PSD icov; clamping costs nothing
    # and guarantees exp() cannot overflow to inf even if an icov ever goes
    # indefinite again (see eig3.floor_regularize rel_guard) — a -inf score
    # false-converges the Newton loop at iteration 1
    md = jnp.maximum(md, 0.0)
    e = tgt.d1 * jnp.exp(-0.5 * tgt.d2 * md)
    w = (found & mask[:, None]).astype(moved.dtype)
    return jnp.sum(e * w)


def score_derivatives(d1, d2, moved0, mask, means, icovs, found):
    """Analytic gradient, Hessian AND score of the NDT mixture at delta=0 for
    the left-multiplied twist q(delta) = p + v + w x p + 0.5 w x (w x p)
    + 0.5 w x v (the quadratic truncation of exp([v,w]^) p — exact value,
    gradient and Hessian at delta=0, where they are evaluated).

    Replaces jax.grad/jax.hessian of the composed score (same values —
    parity-tested against autodiff in tests/test_registration.py) at a
    fraction of the compile and run cost; the closed-form structure follows
    Magnusson 2009 §6.2 / PCL ndt.hpp computeDerivatives, specialized to the
    twist parameterization instead of PCL's Euler angles.

    Per term s = d1 exp(-d2/2 q^T B q) with a = Bq, J = dq/ddelta = [I|-hat(p)]:
      ds/ddelta   = -d2 s (J^T a)
      d2s/ddelta2 = -d2 s (-d2 (J^T a)(J^T a)^T + J^T B J + S),
    where S_ab = sum_m a_m d2 q_m/ddelta_a ddelta_b has blocks
      S_vv = 0, S_vw = 0.5 hat(a), S_wv = S_vw^T,
      S_ww = 0.5 (a p^T + p a^T) - (a.p) I.

    Implementation: since J, hat(p) depend only on the point (not the
    neighbor cell k), every E-weighted sum over k collapses to four
    per-point moments — Σ_k E, ã = Σ_k E a, Ã = Σ_k E a aᵀ, B̃ = Σ_k E B —
    followed by 3x3 block algebra with hat(p). No (N, K, 6, 6) temporaries
    are ever materialized (the naive einsum form lowered to ~13 ms/call on
    TPU; this form is bandwidth-bound on the (N, K, 3, 3) icovs read).

    Returns (grad (6,), hessian (6, 6), score ()): the score is sum(E) — free
    here, and it lets the Newton loop's accept gate compare trial scores
    against the current score under the SAME association without any extra
    pass.
    """
    dtype = moved0.dtype
    p = moved0  # (N, 3)
    q = p[:, None, :] - means  # (N, K, 3)
    a = jnp.einsum("nkij,nkj->nki", icovs, q)  # B q
    # clamp the Mahalanobis form like _score does (exp-overflow belt)
    u = jnp.maximum(jnp.einsum("nki,nki->nk", q, a), 0.0)
    wgt = (found & mask[:, None]).astype(dtype)
    E = d1 * jnp.exp(-0.5 * d2 * u) * wgt  # weighted per-term score (N, K)

    # per-point moments over the K neighbor cells
    ea = jnp.einsum("nk,nki->ni", E, a)  # ã
    eaa = jnp.einsum("nk,nki,nkj->nij", E, a, a)  # Ã
    eB = jnp.einsum("nk,nkij->nij", E, icovs)  # B̃

    grad = -d2 * jnp.concatenate([jnp.sum(ea, axis=0), jnp.sum(jnp.cross(p, ea), axis=0)])

    Hp = se3.hat(p)  # (N, 3, 3)
    mm = lambda x, y: jnp.einsum("nab,nbc->nac", x, y)
    AHp = mm(eaa, Hp)
    HpA = mm(Hp, eaa)
    HpAHp = mm(HpA, Hp)
    BHp = mm(eB, Hp)
    HpB = mm(Hp, eB)
    HpBHp = mm(HpB, Hp)
    hat_ea = se3.hat(ea)
    eapt = ea[:, :, None] * p[:, None, :]
    eadp = jnp.einsum("ni,ni->n", ea, p)

    # core = -d2 (g gᵀ) + JᵀBJ + S, summed over k, as 3x3 blocks:
    #   g gᵀ   = [[Ã, -Ã Hp], [Hp Ã, -Hp Ã Hp]]      (g = [a; hat(p) a])
    #   JᵀBJ   = [[B̃, -B̃ Hp], [Hp B̃, -Hp B̃ Hp]]     (J = [I | -hat(p)])
    #   S      = [[0, 0.5 hat(ã)], [-0.5 hat(ã), 0.5(ã pᵀ + p ãᵀ) - (ã·p) I]]
    C_vv = -d2 * eaa + eB
    C_vw = -d2 * (-AHp) + (-BHp) + 0.5 * hat_ea
    C_wv = -d2 * HpA + HpB - 0.5 * hat_ea
    C_ww = (
        -d2 * (-HpAHp)
        + (-HpBHp)
        + 0.5 * (eapt + jnp.swapaxes(eapt, -1, -2))
        - eadp[:, None, None] * jnp.eye(3, dtype=dtype)
    )
    H = -d2 * jnp.block(
        [
            [jnp.sum(C_vv, axis=0), jnp.sum(C_vw, axis=0)],
            [jnp.sum(C_wv, axis=0), jnp.sum(C_ww, axis=0)],
        ]
    )
    return grad, H, jnp.sum(E)


class _NewtonState(NamedTuple):
    T: jax.Array
    it: jax.Array
    converged: jax.Array
    score: jax.Array
    num_inliers: jax.Array
    # cell association carried across iterations (fixed-cells mode). It is
    # refreshed (pack+lookup+gather, ~1.4 ms at 8k pts on TPU — the single
    # most expensive stage of the Newton body) only when the accumulated
    # per-point displacement bound since the last refresh exceeds the
    # reassoc budget, or when the loop is about to declare convergence on a
    # stale association (then it refreshes and re-checks instead).
    found: jax.Array  # (N, K) bool
    means: jax.Array  # (N, K, 3)
    icovs: jax.Array  # (N, K, 3, 3)
    # accumulated displacement bound sum_steps alpha*(|v| + |w|*r_max) since
    # the last fresh association; 0 right after a refresh
    disp: jax.Array  # () float


@partial(
    jax.jit,
    static_argnames=("max_iterations", "nn_search_method", "num_line_search", "line_search_fixed_cells"),
)
def align(
    tgt: NdtTarget,
    src: PointCloud,
    guess: jax.Array,
    transformation_epsilon=0.01,
    max_iterations: int = 64,
    step_size=0.1,
    nn_search_method: str = "DIRECT7",
    num_line_search: int = 10,
    line_search_fixed_cells: bool = True,
    reassoc_displacement=0.0,
) -> AlignResult:
    """Newton-optimize the NDT mixture score from ``guess``.

    line_search_fixed_cells=True (default): line-search trials score against
    the cell association of the CURRENT pose and acceptance compares the best
    trial against the current score under that SAME association (a
    consistent comparison — no mixed-provenance scores). The association is
    re-gathered (pack+lookup+gather, the most expensive stage of the Newton
    body on TPU) only when the accumulated per-point displacement bound
    since the last refresh exceeds ``reassoc_displacement`` meters
    (displacement bound per step: alpha * (|v| + |w| * (r_max + |t|)),
    r_max = the farthest source point) — or when the loop is about to
    declare convergence on a stale association: then it refreshes and
    re-checks instead, so the final pose always survives a
    fresh-association line search. The default 0.0 refreshes on every
    accepted step (strictest; config: reg_reassoc_displacement); 0.5 m at
    the 2.0 m default cell size measured 10.5 -> 7.6 ms on an 8k-pt TPU
    align with identical endpoints (PERF.md round 3). PCL's More-Thuente
    search re-associates every trial evaluation (ndt.hpp
    computeStepLengthMT); pass line_search_fixed_cells=False for that
    trial-exact parity (DIRECT7 cost scales with the trial count: ~11 cell
    gathers per Newton iteration).

    Under vmap (batched candidate aligns) every lax.cond in the body lowers
    to a select that evaluates BOTH branches — the refresh and rescue
    gathers then run every iteration for every candidate (correct, but no
    gating savings; same caveat as base.lm_loop).
    """
    if nn_search_method.upper() == "KDTREE":
        gather = lambda pts, mask: _gather_cells_kdtree(tgt, pts, mask)
    else:
        offsets = voxelops.neighbor_offsets(nn_search_method)
        gather = lambda pts, mask: _gather_cells(tgt, pts, mask, offsets)
    dtype = guess.dtype
    src_xyz = src.xyz
    src_mask = src.mask
    # farthest valid source point: converts a unit twist into a per-point
    # displacement bound for the re-association gate
    r_max = jnp.sqrt(jnp.max(jnp.where(src_mask, jnp.sum(src_xyz * src_xyz, axis=-1), 0.0)))
    disp_budget = jnp.asarray(reassoc_displacement, dtype)

    def full_score(T):
        """Score with a FRESH association at T; returns the association so
        callers can reuse it (it is exactly the association of the next
        iteration's linearization point when T is accepted). The single
        source of the transform+gather+score sequence — the refresh and
        rescue branches reuse it (the score einsum is ~2% of the gathers)."""
        moved = se3.transform_points(T, src_xyz)
        idx, found = gather(moved, src_mask)
        means, icovs = _gather_mean_icov(tgt, idx)
        ninl = jnp.sum(jnp.any(found & src_mask[:, None], axis=1).astype(jnp.int32))
        return _score(tgt, moved, src_mask, means, icovs, found), ninl, (found, means, icovs)

    def cond(s: _NewtonState):
        return (s.it < max_iterations) & jnp.logical_not(s.converged)

    def body(s: _NewtonState):
        # correspondences at (or within disp_budget of) the current pose,
        # carried in the loop state — no gather happens here
        moved0 = se3.transform_points(s.T, src_xyz)
        found, means, icovs = s.found, s.means, s.icovs

        g, H, score0 = score_derivatives(tgt.d1, tgt.d2, moved0, src_mask, means, icovs, found)
        # PD correction (PCL adds a multiple of I when H has negative evals).
        # The base margin is MARQUARDT-STYLE — proportional to each diagonal
        # entry (H + m*diag(H)) — NOT a multiple of the spectral scale: the
        # NDT Hessian's rotation block scales like r_max^2 over the
        # translation block (~1e5 ratio at 50 m range), so a spectral-scale
        # margin*I damps translation directions by orders of magnitude over
        # their true curvature and the Newton step collapses (observed: a
        # 0.4 mm step against an 80 mm offset, "converged" without moving —
        # windowed NDT odometry silently tracked nothing). Relative damping
        # preserves per-direction conditioning; the ladder's Gershgorin
        # rungs stay ABSOLUTE shifts, which is what a genuinely indefinite H
        # needs. Each rung is solved by the unrolled Cholesky whose minimum
        # pivot certifies PD; the least-damped certified step wins, and the
        # top rung (full Gershgorin) always certifies, so d is always a
        # descent direction of a PD model.
        from ..ops.small_solve import gershgorin_min, solve_spd_checked

        scale = jnp.max(jnp.sum(jnp.abs(H), axis=-1))  # >= spectral radius
        dH = jnp.abs(jnp.diag(H))
        if nn_search_method.upper() == "KDTREE":
            # KDTREE's support set (nearest centroids, radius-gated) is
            # discontinuous in pose, so its score surface is bumpy; the
            # conservative global margin's short steps stay in the global
            # basin (relative damping measured terr 0.0013 -> 0.18 here)
            margin = 1e-3 * jnp.maximum(scale, 1.0) * jnp.ones_like(dH)
        else:
            margin = 1e-3 * jnp.maximum(dH, 1e-9 * jnp.maximum(scale, 1.0))
        eye6 = jnp.eye(6, dtype=dtype)
        neg = jnp.maximum(-gershgorin_min(H), 0.0)
        tol = 1e-9 * jnp.maximum(scale, 1.0)
        # top rung: the old GLOBAL margin + full Gershgorin shift — min eig
        # >= 1e-3*scale, so its Cholesky pivots clear tol and the ladder is
        # guaranteed a certified rung even when some diag(H) entry is ~0
        # (a near-unconstrained twist direction would otherwise leave every
        # relative-margin rung uncertified and keep an uncertified solve)
        shifts = [jnp.diag(margin) + (f * neg) * eye6 for f in (0.0, 1.0 / 27.0, 1.0 / 9.0, 1.0 / 3.0)]
        shifts.append((1e-3 * jnp.maximum(scale, 1.0) + neg) * eye6)
        d = None
        taken = None
        for shift in shifts:
            x, mp = solve_spd_checked(H + shift, g)
            ok = mp > tol
            if d is None:
                d, taken = x, ok
            else:
                d = jnp.where(taken, d, x)
                taken = taken | ok
        d = -d
        # guaranteed descent: fall back to steepest descent if the solve
        # still produced an ascent direction numerically
        d = jnp.where(jnp.dot(g, d) < 0.0, d, -g)
        dnorm = jnp.linalg.norm(d)
        ddir = d / jnp.where(dnorm < 1e-12, 1.0, dnorm)

        # parallel line search over step lengths in (0, step_size]
        base = jnp.minimum(dnorm, step_size)
        alphas = base * (0.5 ** jnp.arange(num_line_search, dtype=dtype))

        if line_search_fixed_cells:
            # trials reuse the association gathered for the derivatives
            def trial(alpha):
                T = se3.compose(se3.se3_exp(alpha * ddir), s.T)
                moved = se3.transform_points(T, src_xyz)
                return _score(tgt, moved, src_mask, means, icovs, found)

            trial_scores = jax.vmap(trial)(alphas)
            best = jnp.argmin(trial_scores)
            T_best = se3.compose(se3.se3_exp(alphas[best] * ddir), s.T)
            # accept compares against score0 — the score at s.T under the
            # SAME association the trials used (consistent comparison)
            best_score = trial_scores[best]
            current_score = score0
        else:
            def trial(alpha):
                T = se3.compose(se3.se3_exp(alpha * ddir), s.T)
                moved = se3.transform_points(T, src_xyz)
                i2, f2 = gather(moved, src_mask)
                m2, c2 = _gather_mean_icov(tgt, i2)
                return _score(tgt, moved, src_mask, m2, c2, f2)

            trial_scores = jax.vmap(trial)(alphas)
            best = jnp.argmin(trial_scores)
            T_best = se3.compose(se3.se3_exp(alphas[best] * ddir), s.T)
            best_score = trial_scores[best]
            current_score = s.score

        improve = best_score < current_score
        if line_search_fixed_cells:
            # RESCUE: a failed fixed-association line search on a fresh
            # association, with real (>= epsilon) step candidates available,
            # re-scores the best candidate under a FRESH gather before
            # giving up — the fixed set is pessimistic when the step brings
            # new cells into range (KDTREE's nearest-centroid sets change
            # under the step; measured terr 0.0013 -> 0.184 without this).
            # base < epsilon means Newton itself proposes no real step, so
            # the extra gather is skipped at the true convergence iteration.
            fresh0 = s.disp == 0.0
            need_rescue = jnp.logical_not(improve) & fresh0 & (alphas[0] >= transformation_epsilon)

            def do_rescue():
                sc, ninl2, (f2, m2, c2) = full_score(T_best)
                return sc, f2, m2, c2, ninl2

            rescue_score, r_found, r_means, r_icovs, r_ninl = jax.lax.cond(
                need_rescue,
                do_rescue,
                lambda: (jnp.asarray(jnp.inf, dtype), s.found, s.means, s.icovs, s.num_inliers),
            )
            rescued = need_rescue & (rescue_score < current_score)
            improve = improve | rescued
        alpha = jnp.where(improve, alphas[best], 0.0)
        T_new = jnp.where(improve, T_best, s.T)
        new_score = jnp.where(improve, best_score, current_score)
        if line_search_fixed_cells:
            new_score = jnp.where(rescued, rescue_score, new_score)
            # converged when the applied update is below epsilon (PCL:
            # incremental transform norm < transformation_epsilon) — but only
            # trusted on a fresh association (disp == 0); a vanishing step on
            # a stale association triggers a refresh and a re-check instead.
            stale = s.disp > 0.0
            would_conv = alpha < transformation_epsilon
            conv = would_conv & jnp.logical_not(stale)
            # points sit at T·p: |exp(ad)Tp - Tp| <= a(|v| + |w|(r_max+|t|))
            radius = r_max + jnp.linalg.norm(s.T[:3, 3])
            step_disp = alpha * (jnp.linalg.norm(ddir[:3]) + jnp.linalg.norm(ddir[3:]) * radius)
            disp_next = s.disp + step_disp
            # a rescued step already carries its fresh association at T_new
            refresh = jnp.logical_not(rescued) & ((would_conv & stale) | (disp_next > disp_budget))

            def do_refresh():
                _sc, ninl2, (f2, m2, c2) = full_score(T_new)
                return f2, m2, c2, ninl2, jnp.asarray(0.0, dtype)

            found_n, means_n, icovs_n, ninl, disp_n = jax.lax.cond(
                refresh,
                do_refresh,
                lambda: (
                    jnp.where(rescued, r_found, s.found),
                    jnp.where(rescued, r_means, s.means),
                    jnp.where(rescued, r_icovs, s.icovs),
                    jnp.where(rescued, r_ninl, s.num_inliers),
                    jnp.where(rescued, 0.0, disp_next).astype(dtype),
                ),
            )
        else:
            conv = alpha < transformation_epsilon
            idx_n, found_n = gather(se3.transform_points(T_new, src_xyz), src_mask)
            means_n, icovs_n = _gather_mean_icov(tgt, idx_n)
            ninl = jnp.sum(jnp.any(found_n & src_mask[:, None], axis=1).astype(jnp.int32))
            disp_n = jnp.asarray(0.0, dtype)
        return _NewtonState(
            T=T_new, it=s.it + 1, converged=conv, score=new_score, num_inliers=ninl,
            found=found_n, means=means_n, icovs=icovs_n, disp=disp_n,
        )

    s0, n0, (found0, means0, icovs0) = full_score(guess)
    init = _NewtonState(
        T=guess,
        it=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        score=s0,
        num_inliers=n0,
        found=found0,
        means=means0,
        icovs=icovs0,
        disp=jnp.asarray(0.0, dtype),
    )
    final = jax.lax.while_loop(cond, body, init)
    # honest final score: evaluated at the final pose under the carried
    # association (fresh after the convergence-gated refresh) — one (N, K)
    # einsum, no gather
    moved_f = se3.transform_points(final.T, src_xyz)
    err = _score(tgt, moved_f, src_mask, final.means, final.icovs, final.found)
    return AlignResult(
        transformation=final.T,
        converged=final.converged,
        iterations=final.it,
        error=err,
        num_inliers=final.num_inliers,
    )
