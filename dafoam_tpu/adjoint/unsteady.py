"""Time-accurate unsteady adjoint: reverse sweep over the stored history.

Re-designs the reference's DAFoamSolverUnsteady.compute_jacvec_product
(dafoam/mphys/mphys_dafoam.py:1390-1679) and calcdRdWOldTPsiAD
(DASolver.C:1910): the discrete adjoint of implicit-Euler/BDF2 stepping.

Reference mechanism: store every time step to DISK during the primal, then
re-read W^n, W^{n-1}, W^{n-2} per reverse step. TPU-native: the primal's
lax.scan stacks the history in device memory (host offload is the future
extension), and the reverse sweep is one lax.scan whose body does
  rhs    = w_n dF/dW^n - (dR^{n+1}/dW^n)^T psi^{n+1}
           - (dR^{n+2}/dW^n)^T psi^{n+2}
  psi^n  : (dR^n/dW^n)^T psi^n = rhs          (matrix-free FGMRES)
  totals+= w_n pF/px - (dR^n/dx)^T psi^n
so each GMRES/vjp compiles once and is reused for every step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg.krylov import gmres


def _at(hist, n):
    return jax.tree_util.tree_map(lambda a: a[n], hist)


def unsteady_adjoint_totals(
        residual_fn: Callable,   # (W, W_old, W_oldold, inputs) -> res pytree
        func_fn: Callable,       # (W, inputs) -> scalar (per-step function)
        hist,                    # pytree stacked (T+1, ...), index 0 = IC
        inputs,
        weights: jnp.ndarray,    # (T,) dJ/df_n from the time op
        ddt_order: int = 1,
        state_scales=None, res_scales=None,
        restart=100, rel_tol=1e-8, abs_tol=1e-14, max_iters=1000,
        precond_builder: Callable | None = None,
        time_dep: bool = False):
    """Returns (totals w.r.t. inputs, per-step adjoint residual info).

    time_dep=True: the residual/function depend explicitly on the step
    index (moving meshes — reference DAPimpleDyMFoam reads per-step mesh
    points in its reverse sweep, pyDAFoam.py:1288 readDynamicMeshPoints);
    signatures become residual_fn(W, W_old, W_oldold, inputs, n) and
    func_fn(W, inputs, n)."""

    if not time_dep:
        rf, ff = residual_fn, func_fn
        residual_fn = lambda W, Wo, Woo, x, n: rf(W, Wo, Woo, x)  # noqa
        func_fn = lambda W, x, n: ff(W, x)                        # noqa

    T = jax.tree_util.tree_leaves(hist)[0].shape[0] - 1
    zeros_state = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a[0]), hist)

    def _sc(tree, scales, invert=False):
        if not scales:
            return tree
        return {k: (v / scales.get(k, 1.0) if invert else v * scales.get(k, 1.0))
                for k, v in tree.items()}

    def step(carry, n):
        psi1, psi2, totals = carry     # psi^{n+1}, psi^{n+2}
        W = _at(hist, n)
        W1 = _at(hist, jnp.maximum(n - 1, 0))
        W2 = _at(hist, jnp.maximum(n - 2, 0))

        # RHS: function seed at step n
        g = jax.grad(lambda w: func_fn(w, inputs, n))(W)
        wgt = weights[n - 1]
        rhs = jax.tree_util.tree_map(lambda x: wgt * x, g)

        # cross-step terms: R^{n+1}(W^{n+1}; W^n, W^{n-1}) depends on W^n
        # through its OLD-time slot -> (dR^{n+1}/dW^n)^T psi^{n+1}
        Wp1 = _at(hist, jnp.minimum(n + 1, T))
        _, vjp_old = jax.vjp(
            lambda wold: residual_fn(Wp1, wold, W1, inputs, n + 1), W)
        (c1,) = vjp_old(psi1)
        have1 = (n + 1 <= T).astype(weights.dtype)
        rhs = jax.tree_util.tree_map(lambda r, c: r - have1 * c, rhs, c1)

        if ddt_order == 2:
            Wp2 = _at(hist, jnp.minimum(n + 2, T))
            Wp1b = _at(hist, jnp.minimum(n + 1, T))
            _, vjp_oo = jax.vjp(
                lambda woo: residual_fn(Wp2, Wp1b, woo, inputs, n + 2), W)
            (c2,) = vjp_oo(psi2)
            have2 = (n + 2 <= T).astype(weights.dtype)
            rhs = jax.tree_util.tree_map(lambda r, c: r - have2 * c, rhs, c2)

        # solve (dR^n/dW^n)^T psi = rhs (scaled like the steady adjoint)
        _, f_vjp = jax.vjp(lambda w: residual_fn(w, W1, W2, inputs, n), W)

        def matT(ps):
            p = _sc(ps, res_scales, invert=True)
            (out,) = f_vjp(p)
            return _sc(out, state_scales)

        pc = precond_builder(W, W1, W2, inputs) if precond_builder else None
        psi_s, info = gmres(matT, _sc(rhs, state_scales), precond=pc,
                            restart=restart, rel_tol=rel_tol,
                            abs_tol=abs_tol, max_iters=max_iters)
        psi = _sc(psi_s, res_scales, invert=True)

        # totals: w_n pF/px - (dR^n/dx)^T psi
        _, fx_vjp = jax.vjp(lambda x: func_fn(W, x, n), inputs)
        (dfdx,) = fx_vjp(jnp.asarray(1.0, weights.dtype))
        _, rx_vjp = jax.vjp(lambda x: residual_fn(W, W1, W2, x, n), inputs)
        (drx,) = rx_vjp(psi)
        totals = jax.tree_util.tree_map(
            lambda t, a, b: t + wgt * a - b, totals, dfdx, drx)

        return (psi, psi1, totals), info.resid

    totals0 = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    (psi, _, totals), resids = jax.lax.scan(
        step, (zeros_state, zeros_state, totals0),
        jnp.arange(T, 0, -1))
    return totals, resids
