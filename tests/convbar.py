"""Convergence-scaled triangulation bars (ADVICE r4).

The unsteady reverse adjoint linearizes R(W^n)=0 at the STORED history
while forward-mode jvp differentiates the COMPUTED sweeps, so they agree
only up to the per-step outer residual times a sensitivity factor. A
FIXED tolerance either hides structural AD regressions (too loose once
inner solves are tightened) or flakes at the solver floor (too tight).
Instead, scale the bar to the MEASURED final-step residual: it tightens
automatically whenever inner solves are tightened, and is capped at the
historical fixed bar so it can never get weaker than it was.
"""

import jax
import jax.numpy as jnp
import numpy as np


def last_step_residual(solver, stT, hist, inputs, n=None, dym=False):
    """Max-abs unsteady residual at the final stored step (the linearization
    point of the reverse sweep's last segment)."""
    W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
    W_oldold = jax.tree_util.tree_map(
        lambda a: a[-3] if a.shape[0] > 2 else a[-2], hist)
    if dym:
        r = solver.residuals_unsteady_n(stT, W_old, W_oldold, inputs, n)
    else:
        r = solver.residuals_unsteady(stT, W_old, W_oldold, inputs, n=n)
    return max(float(jnp.abs(v).max()) for v in r.values())


def rel_bar(res_max, dtype, cap, C=5.0):
    """Relative tolerance for adjoint-vs-forward-AD agreement: C times the
    measured per-step residual, never looser than the historical fixed
    `cap`, never tighter than 64 machine epsilons."""
    eps = float(jnp.finfo(dtype).eps)
    return float(np.clip(C * res_max, 64.0 * eps, cap))
