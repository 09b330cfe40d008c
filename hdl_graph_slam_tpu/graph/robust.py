"""The nine g2o robust kernels as IRLS weight functions.

Reference: GraphSLAM::add_robust_kernel (src/hdl_graph_slam/graph_slam.cpp:
275-290) constructs kernels by factory name; robust_kernel_io.cpp:14-43 lists
the full set: Huber, Cauchy, DCS, Fair, GemanMcClure, PseudoHuber, Saturated,
Tukey, Welsch. Each kernel maps the edge's chi2 e2 to rho = (rho0, rho1,
rho2); Gauss-Newton robustification scales the edge's H and b contributions
by rho1 (g2o's first-order robustification — the rho2 term is only applied
by g2o when it keeps the system PSD, and vanishes for these kernels in the
common configuration).

Branch-free vectorized forms: every edge carries an int kernel id and a
delta; a jnp.switch-free select evaluates all kernels and picks by id (9
scalar formulas — negligible next to the Jacobian work).
"""

from __future__ import annotations

import jax.numpy as jnp

KERNEL_IDS = {
    "NONE": 0,
    "Huber": 1,
    "Cauchy": 2,
    "DCS": 3,
    "Fair": 4,
    "GemanMcClure": 5,
    "PseudoHuber": 6,
    "Saturated": 7,
    "Tukey": 8,
    "Welsch": 9,
}
KERNEL_NAMES = {v: k for k, v in KERNEL_IDS.items()}


def rho_and_weight(e2, kernel_id, delta):
    """(rho0, rho1) for each edge: robustified chi2 and the IRLS weight.

    e2, kernel_id, delta: (...,) arrays. Formulas follow g2o's
    robust_kernel_impl.cpp.
    """
    e2 = jnp.clip(e2, 0.0, None)
    d = delta
    d2 = d * d
    e = jnp.sqrt(e2 + 1e-30)

    # Huber
    hub_out = e2 > d2
    rho0_h = jnp.where(hub_out, 2.0 * e * d - d2, e2)
    rho1_h = jnp.where(hub_out, d / e, 1.0)
    # Cauchy: rho0 = d2 * log(1 + e2/d2); rho1 = 1/(1+e2/d2)
    c_aux = 1.0 + e2 / d2
    rho0_c = d2 * jnp.log(c_aux)
    rho1_c = 1.0 / c_aux
    # DCS: s = min(1, 2d/(d+e2)); rho1 = s^2; rho0 = s*(2-s)*e2 (Agarwal 2013)
    s_dcs = jnp.minimum(1.0, 2.0 * d / (d + e2))
    rho0_dcs = s_dcs * (2.0 - s_dcs) * e2
    rho1_dcs = s_dcs * s_dcs
    # Fair: rho0 = 2 d^2 (e/d - log(1+e/d)); rho1 = 1/(1+e/d)
    f_aux = e / d
    rho0_f = 2.0 * d2 * (f_aux - jnp.log1p(f_aux))
    rho1_f = 1.0 / (1.0 + f_aux)
    # Geman-McClure: aux = d/(d+e2); rho0 = e2*aux; rho1 = aux^2
    gm_aux = d / (d + e2)
    rho0_gm = e2 * gm_aux
    rho1_gm = gm_aux * gm_aux
    # Pseudo-Huber: rho0 = 2 d2 (sqrt(1+e2/d2)-1); rho1 = 1/sqrt(1+e2/d2)
    ph_aux = jnp.sqrt(1.0 + e2 / d2)
    rho0_ph = 2.0 * d2 * (ph_aux - 1.0)
    rho1_ph = 1.0 / ph_aux
    # Saturated: rho0 = min(e2, d2); rho1 = [e2 <= d2]
    rho0_s = jnp.minimum(e2, d2)
    rho1_s = (e2 <= d2).astype(e2.dtype)
    # Tukey: inside: rho0 = d2/3 (1-(1-e2/d2)^3); rho1 = (1-e2/d2)^2; else flat
    t_in = e2 <= d2
    t_aux = jnp.clip(1.0 - e2 / d2, 0.0, None)
    rho0_t = jnp.where(t_in, d2 / 3.0 * (1.0 - t_aux**3), d2 / 3.0)
    rho1_t = jnp.where(t_in, t_aux * t_aux, 0.0)
    # Welsch: rho0 = d2/2 (1 - exp(-e2/d2)); rho1 = exp(-e2/d2) / 2... g2o:
    # rho0 = d2*(1-exp(-e2/d2)); rho1 = exp(-e2/d2)
    w_aux = jnp.exp(-e2 / d2)
    rho0_w = d2 * (1.0 - w_aux)
    rho1_w = w_aux

    rho0_all = jnp.stack([e2, rho0_h, rho0_c, rho0_dcs, rho0_f, rho0_gm, rho0_ph, rho0_s, rho0_t, rho0_w], axis=-1)
    rho1_all = jnp.stack(
        [jnp.ones_like(e2), rho1_h, rho1_c, rho1_dcs, rho1_f, rho1_gm, rho1_ph, rho1_s, rho1_t, rho1_w],
        axis=-1,
    )
    kid = jnp.clip(kernel_id, 0, 9)[..., None]
    rho0 = jnp.take_along_axis(rho0_all, kid, axis=-1)[..., 0]
    rho1 = jnp.take_along_axis(rho1_all, kid, axis=-1)[..., 0]
    return rho0, rho1
