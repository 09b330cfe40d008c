"""Registration interface shared by ICP/GICP/VGICP/NDT.

Mirrors the surface the reference uses from pcl::Registration
(src/hdl_graph_slam/registrations.cpp, scan_matching_odometry_nodelet.cpp:210,
loop_detector.hpp:135-154): set a target once (amortized preprocessing),
align many sources against it with an initial guess, read back the final
transformation / convergence / fitness.

TPU design: ``preprocess_target`` produces an immutable pytree of device
arrays; ``align`` is a pure jitted function (target_state, source, guess) ->
AlignResult, so loop-closure candidate matching can ``vmap`` it over a batch
of candidates — replacing the reference's sequential candidate loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AlignResult(NamedTuple):
    transformation: jax.Array  # (4, 4) final source->target transform
    converged: jax.Array  # () bool — converged within max_iterations
    iterations: jax.Array  # () int32 — outer iterations executed
    error: jax.Array  # () float — final objective value (method-specific)
    num_inliers: jax.Array  # () int32 — correspondences used in last step


def se3_delta_converged(delta: jax.Array, epsilon) -> jax.Array:
    """Convergence test on an incremental transform, following
    fast_gicp::LsqRegistration::is_converged: the update's rotation block
    (scaled by 2) and translation must both be elementwise below epsilon."""
    R = delta[:3, :3]
    t = delta[:3, 3]
    rot_small = jnp.max(jnp.abs(2.0 * (R - jnp.eye(3, dtype=delta.dtype)))) < epsilon
    trans_small = jnp.max(jnp.abs(t)) < epsilon
    return rot_small & trans_small


class LMState(NamedTuple):
    T: jax.Array
    lam: jax.Array
    nu: jax.Array
    it: jax.Array
    converged: jax.Array
    num_inliers: jax.Array
    error: jax.Array


def lm_loop(
    associate,
    linearize_at,
    cost_at,
    guess: jax.Array,
    max_iterations: int,
    transformation_epsilon,
    lm_init_lambda_factor=1e-9,
    reassoc_displacement: float = 0.0,
    r_max=None,
) -> AlignResult:
    """Levenberg-Marquardt over SE(3) with Nielsen damping, shared by
    GICP/VGICP (fast_gicp LsqRegistration::step_lm structure).

    - ``associate(T) -> corr`` computes correspondences + fixed Mahalanobis
      weights at the current pose (fast_gicp update_correspondences);
    - ``linearize_at(T, corr) -> (H, b, cost, num_inliers)``;
    - ``cost_at(T, corr) -> cost`` evaluates a trial pose *with the same
      correspondences* (fast_gicp compute_error semantics).

    Trial costs MUST use fixed correspondences: the gated sum-cost is not
    monotone under re-association (a pose closer to truth admits new
    correspondences and can raise the sum), which creates spurious barriers
    that permanently stall rotation estimation.

    The left-multiplied increment exp(d) is applied as T <- exp(d) @ T. One
    trial per while_loop step: a rejected trial keeps the current pose,
    keeping shapes static; semantics match the reference's nested
    accept/reject loop.

    reassoc_displacement > 0 (static; requires ``r_max`` = the farthest
    source point's radius) carries the correspondences across iterations and
    re-runs ``associate`` only when the accumulated per-point displacement
    bound since the last association (sum of |d_v| + |d_w| * r_max over
    accepted steps) exceeds that many meters — or when the loop is about to
    declare convergence on a stale association, in which case it refreshes
    and re-checks instead. The terminal pose therefore always satisfies the
    same fixed-point condition as fast_gicp's per-iteration re-association
    (LM-converged under a fresh association); what changes is only the path
    taken. 0.0 (default) re-associates every iteration like fast_gicp —
    including at an unchanged pose after a rejected trial, where it is
    recomputing an identical result.

    Under vmap (e.g. the batched loop-closure candidates) the lax.cond
    lowers to a select that evaluates BOTH branches, so gating saves nothing
    there — it stays correct, but per-candidate associate() runs every
    iteration regardless of the budget.
    """
    from ..core import se3  # local import to avoid cycle

    dtype = guess.dtype
    eye6 = jnp.eye(6, dtype=dtype)

    corr0 = associate(guess)
    H0, b0, cost0, n0 = linearize_at(guess, corr0)
    lam0 = lm_init_lambda_factor * jnp.max(jnp.abs(jnp.diag(H0)))
    gated = bool(reassoc_displacement)
    if gated and r_max is None:
        raise ValueError("reassoc_displacement > 0 requires r_max")

    def cond(s):
        return (s[0].it < max_iterations) & jnp.logical_not(s[0].converged)

    def lm_step(s: LMState, corr):
        """One damped trial with fixed correspondences; returns the updated
        LMState pieces + the step twist d and accept flag."""
        H, b, cost, ninl = linearize_at(s.T, corr)
        # damped system is SPD by construction: unrolled 6x6 Cholesky beats
        # the generic LU-with-pivoting lowering of jnp.linalg.solve on TPU
        from ..ops.small_solve import solve_spd

        d = -solve_spd(H + s.lam * eye6, b)
        delta = se3.se3_exp(d)
        T_new = se3.compose(delta, s.T)
        cost_new = cost_at(T_new, corr)
        accept = (cost_new < cost) & jnp.isfinite(cost_new)
        denom = jnp.dot(d, s.lam * d - b)
        rho = (cost - cost_new) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)

        lam_acc = s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_rej = s.lam * s.nu
        lam = jnp.where(accept, lam_acc, lam_rej)
        nu = jnp.where(accept, 2.0, 2.0 * s.nu)
        T = jnp.where(accept, T_new, s.T)
        # Converged when the damped step is below epsilon, accepted or not:
        # in f32 the trial-cost comparison bottoms out at the rounding noise
        # floor near the optimum — rejections then double lambda forever and
        # the accept-gated test would spin to max_iterations (observed on
        # TPU: ~24% of frames at 64 iterations with optimal poses). A
        # rejected sub-epsilon step means no progress >= epsilon is possible,
        # which is exactly fast_gicp's termination condition.
        conv = se3_delta_converged(delta, transformation_epsilon)
        return LMState(T=T, lam=lam, nu=nu, it=s.it + 1, converged=conv,
                       num_inliers=ninl, error=jnp.where(accept, cost_new, cost)), d, accept

    init = LMState(
        T=guess,
        lam=jnp.asarray(lam0, dtype),
        nu=jnp.asarray(2.0, dtype),
        it=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        num_inliers=n0,
        error=cost0,
    )

    if not gated:
        def body(carry):
            s, _ = carry
            corr = associate(s.T)
            s2, _, _ = lm_step(s, corr)
            return (s2, 0)

        final, _ = jax.lax.while_loop(cond, body, (init, 0))
    else:
        budget = jnp.asarray(reassoc_displacement, dtype)

        def body(carry):
            s, (corr, disp) = carry
            s2, d, accept = lm_step(s, corr)
            # per-point displacement bound of exp(d) applied to T: points sit
            # at T·p, so |exp(d)Tp - Tp| <= |d_v| + |d_w| * (r_max + |t|)
            radius = r_max + jnp.linalg.norm(s.T[:3, 3])
            step_disp = jnp.where(
                accept, jnp.linalg.norm(d[:3]) + jnp.linalg.norm(d[3:]) * radius, 0.0
            ).astype(dtype)
            disp_next = disp + step_disp
            stale = disp > 0.0
            # only trust convergence on a fresh association; a stale one
            # refreshes and re-checks next iteration
            conv_refresh = s2.converged & stale
            conv = s2.converged & jnp.logical_not(stale)
            refresh = conv_refresh | (disp_next > budget)
            corr_n, disp_n = jax.lax.cond(
                refresh,
                lambda: (associate(s2.T), jnp.asarray(0.0, dtype)),
                lambda: (corr, disp_next),
            )
            # Stale-trial rejections inflate lambda before the convergence-
            # triggered refresh fires; re-checking the fresh association with
            # that inflated damping can burn iterations to max_iterations
            # where the ungated loop converges. Re-seed the damping for the
            # fresh re-check (ADVICE r2).
            lam_n = jnp.where(conv_refresh, jnp.asarray(lam0, dtype), s2.lam)
            nu_n = jnp.where(conv_refresh, jnp.asarray(2.0, dtype), s2.nu)
            # num_inliers stays s2's (the correspondences actually linearized
            # this step); a just-refreshed corr_n is only *used* next step
            return (s2._replace(converged=conv, lam=lam_n, nu=nu_n), (corr_n, disp_n))

        final, _ = jax.lax.while_loop(cond, body, (init, (corr0, jnp.asarray(0.0, dtype))))
        # Honest informational error on a max-iterations exit: the loop's
        # last cost was evaluated under a possibly stale association; NDT
        # recomputes a final fresh score, GICP/VGICP must match (ADVICE r2).
        # On a converged exit the association was fresh by construction, so
        # the (rare) recompute runs only for non-converged exits.
        def _fresh_error():
            return cost_at(final.T, associate(final.T))

        final = final._replace(
            error=jax.lax.cond(final.converged, lambda: final.error, _fresh_error)
        )
    return AlignResult(
        transformation=final.T,
        converged=final.converged,
        iterations=final.it,
        error=final.error,
        num_inliers=final.num_inliers,
    )
