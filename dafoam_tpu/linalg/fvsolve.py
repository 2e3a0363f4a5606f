"""Solve one FvMatrix equation (the primal's segregated sub-solves).

Plays the role of OpenFOAM's ``fvMatrix::solve()`` inside the reference's
primal loops (UEqnSimple.H `solve(UEqn == -fvc::grad(p))`, pEqnSimple.H
`pEqn.solve()`): symmetric systems (pressure) go to diagonally-preconditioned
CG, asymmetric (momentum/turbulence) to BiCGStab.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg.krylov import SolveInfo, bicgstab, cg
from dafoam_tpu.ops.fvmatrix import FvMatrix, matvec


def _diag_like(m: FvMatrix, psi):
    d = m.diag
    if d.ndim != psi.ndim:
        d = d[..., None] if d.ndim < psi.ndim else d
    return d


def solve(m: FvMatrix, psi0, topo, symmetric=False, rel_tol=1e-7,
          abs_tol=1e-50, max_iters=500, rhs=None,
          trans_rel_tol=None, trans_max_iters=None):
    """Solve M x = source (+rhs) starting from psi0. Returns (x, SolveInfo).

    Wrapped in ``lax.custom_linear_solve`` so the whole primal step is
    REVERSE-differentiable: the cotangent of x = M^-1 b is computed by the
    same Krylov solver on M^T (the implicit-function rule), which is what
    lets the solver-level fixed-point adjoint (reference runFPAdj,
    DASimpleFoam.C:189) differentiate straight through one SIMPLE/PIMPLE
    outer iteration. Forward cost is unchanged (the primitive just calls
    the solver); the transpose path only ever runs inside jax.vjp.

    The transpose solve must be TIGHT even when the forward one is loose:
    the primal only needs each inner solve to reduce the residual a
    little per outer sweep, but the implicit-function cotangent assumes
    an (almost) exact inverse — a loose M^-T leaks straight into the
    fixed-point adjoint's totals (observed: pRelTol 0.05 -> 2.5e-3
    gradient error). Defaults: trans_rel_tol = min(rel_tol, 1e-10),
    trans_max_iters = max(max_iters, 1000).
    """
    b = m.source if rhs is None else m.source + rhs
    d = _diag_like(m, psi0)
    td = jnp.finfo(d.dtype).tiny
    dinv = 1.0 / jnp.where(jnp.abs(d) > td, d, 1.0)

    from dafoam_tpu.ops.fvmatrix import matvec_fn
    mv = matvec_fn(m, topo)

    def prec(r):
        return dinv * r

    solver = cg if symmetric else bicgstab
    # stop_gradient: psi0/preconditioner influence only the iterate path,
    # not the solution the implicit rule differentiates
    x0 = jax.lax.stop_gradient(psi0)

    def fwd(matvec_f, bb):
        x, _ = solver(matvec_f, bb, x0=x0, precond=prec, rel_tol=rel_tol,
                      abs_tol=abs_tol, max_iters=max_iters)
        return x

    t_rel = min(rel_tol, 1e-10) if trans_rel_tol is None else trans_rel_tol
    t_max = max(max_iters, 1000) if trans_max_iters is None \
        else trans_max_iters

    def trans(vecmat_f, bb):
        # diag(M^T) == diag(M): reuse the Jacobi preconditioner
        x, _ = solver(vecmat_f, bb, precond=prec, rel_tol=t_rel,
                      abs_tol=abs_tol, max_iters=t_max)
        return x

    x = jax.lax.custom_linear_solve(mv, b, fwd, transpose_solve=trans,
                                    symmetric=symmetric)
    # per-solve iteration stats cannot escape the custom_linear_solve
    # primitive; outer-loop convergence control uses
    # initial_residual_norm, so no caller needs them (and recomputing the
    # residual here would cost one extra matvec per inner solve)
    zero = jnp.zeros((), x.dtype)
    return x, SolveInfo(jnp.asarray(-1), zero, zero, jnp.asarray(True))


def initial_residual_norm(m: FvMatrix, psi, topo, rhs=None):
    """OpenFOAM-style normalized initial residual (for convergence control,
    reference DAUtility::primalResidualControl)."""
    b = m.source if rhs is None else m.source + rhs
    ax = matvec(m, psi, topo)
    xbar = jnp.mean(psi, axis=0, keepdims=True)
    axbar = matvec(m, jnp.broadcast_to(xbar, psi.shape), topo)
    norm = jnp.sum(jnp.abs(ax - axbar)) + jnp.sum(jnp.abs(b - axbar))
    return jnp.sum(jnp.abs(b - ax)) / jnp.maximum(norm, jnp.finfo(norm.dtype).tiny)
