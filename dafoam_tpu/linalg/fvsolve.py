"""Solve one FvMatrix equation (the primal's segregated sub-solves).

Plays the role of OpenFOAM's ``fvMatrix::solve()`` inside the reference's
primal loops (UEqnSimple.H `solve(UEqn == -fvc::grad(p))`, pEqnSimple.H
`pEqn.solve()`): symmetric systems (pressure) go to diagonally-preconditioned
CG, asymmetric (momentum/turbulence) to BiCGStab.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.linalg.krylov import bicgstab, cg
from dafoam_tpu.ops.fvmatrix import FvMatrix, matvec


def _diag_like(m: FvMatrix, psi):
    d = m.diag
    if d.ndim != psi.ndim:
        d = d[..., None] if d.ndim < psi.ndim else d
    return d


def solve(m: FvMatrix, psi0, topo, symmetric=False, rel_tol=1e-7,
          abs_tol=1e-50, max_iters=500, rhs=None):
    """Solve M x = source (+rhs) starting from psi0. Returns (x, SolveInfo)."""
    b = m.source if rhs is None else m.source + rhs
    d = _diag_like(m, psi0)
    td = jnp.finfo(d.dtype).tiny
    dinv = 1.0 / jnp.where(jnp.abs(d) > td, d, 1.0)

    from dafoam_tpu.ops.fvmatrix import matvec_fn
    mv = matvec_fn(m, topo)

    def prec(r):
        return dinv * r

    solver = cg if symmetric else bicgstab
    return solver(mv, b, x0=psi0, precond=prec, rel_tol=rel_tol,
                  abs_tol=abs_tol, max_iters=max_iters)


def initial_residual_norm(m: FvMatrix, psi, topo, rhs=None):
    """OpenFOAM-style normalized initial residual (for convergence control,
    reference DAUtility::primalResidualControl)."""
    b = m.source if rhs is None else m.source + rhs
    ax = matvec(m, psi, topo)
    xbar = jnp.mean(psi, axis=0, keepdims=True)
    axbar = matvec(m, jnp.broadcast_to(xbar, psi.shape), topo)
    norm = jnp.sum(jnp.abs(ax - axbar)) + jnp.sum(jnp.abs(b - axbar))
    return jnp.sum(jnp.abs(b - ax)) / jnp.maximum(norm, jnp.finfo(norm.dtype).tiny)
