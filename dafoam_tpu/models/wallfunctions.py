"""Wall functions (high-Re near-wall treatment), differentiable.

Re-designs the reference's nutUSpaldingWallFunctionDF
(src/adjoint/DAMisc/boundaryConditions/, an AD-safe fork of OpenFOAM's
nutUSpaldingWallFunction): the friction velocity u_tau at each wall face
solves Spalding's unified law of the wall

    y+ = u+ + (1/E) [exp(k u+) - 1 - k u+ - (k u+)^2/2 - (k u+)^3/6]

with u+ = |U_t|/u_tau, y+ = y u_tau / nu. A fixed-length Newton iteration
(device-resident, unrolled by lax.fori_loop) makes it exactly
differentiable — the reference relies on the operator-overloading AD
seeing through the same loop.

The wall eddy viscosity is then  nut_w = u_tau^2 / (|U_t|/y) - nu  >= 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

KAPPA = 0.41
E_WALL = 9.8


def spalding_utau(mag_up, y, nu, iters=30):
    """Newton solve for u_tau per wall face. All args (nw,) arrays."""
    mag_up = jnp.maximum(mag_up, 1e-12)
    # initial guess: max of viscous and log-law estimates — from below,
    # in the exp-dominated branch, Newton creeps linearly and stalls
    ut_vis = jnp.sqrt(nu * mag_up / y)
    re_y = jnp.maximum(E_WALL * y * mag_up / nu, 2.0)
    ut_log = KAPPA * mag_up / jnp.log(re_y)
    ut0 = jnp.maximum(ut_vis, ut_log)

    def f_and_df(ut):
        ut = jnp.maximum(ut, 1e-12)
        up = mag_up / ut
        kup = jnp.minimum(KAPPA * up, 50.0)
        ekup = jnp.exp(kup)
        f = up + (ekup - 1.0 - kup - kup ** 2 / 2.0 - kup ** 3 / 6.0) \
            / E_WALL - y * ut / nu
        dup = -mag_up / ut ** 2
        dkup = KAPPA * dup
        df = dup + (ekup * dkup - dkup - kup * dkup
                    - kup ** 2 * dkup / 2.0) / E_WALL - y / nu
        return f, df

    def body(_, ut):
        f, df = f_and_df(ut)
        step = f / jnp.where(jnp.abs(df) > 1e-36, df, -1.0)
        ut_new = ut - step
        return jnp.clip(ut_new, 1e-12, 1e6)

    return jax.lax.fori_loop(0, iters, body, ut0)


def spalding_nut_wall(U_cell_tangential_mag, y, nu):
    """nut at the wall face from Spalding's law (>= 0)."""
    ut = spalding_utau(U_cell_tangential_mag, y, nu)
    mag_grad = jnp.maximum(U_cell_tangential_mag, 1e-12) / y
    return jnp.maximum(ut ** 2 / mag_grad - nu, 0.0)


def omega_wall_value(k_cell, y, nu, beta1=0.075):
    """omegaWallFunction blended value for wall-adjacent cells (Menter):
    omega = sqrt(omega_vis^2 + omega_log^2)."""
    w_vis = 6.0 * nu / (beta1 * y ** 2)
    w_log = jnp.sqrt(jnp.maximum(k_cell, 1e-16)) / (0.09 ** 0.25 * KAPPA * y)
    return jnp.sqrt(w_vis ** 2 + w_log ** 2)
