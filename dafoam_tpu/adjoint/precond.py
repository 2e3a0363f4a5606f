"""Segregated block preconditioner for the adjoint GMRES.

The reference preconditions its adjoint KSP with an assembled approximate
Jacobian (colored-FD dRdWTPC, ~30% of adjoint runtime, pyDAFoam.py:413-417)
run through ASM+ILU (DALinearEqn.C:28). The TPU-native replacement uses the
per-equation FvMatrix operators that the residual assembly ALREADY builds —
momentum, pressure, turbulence — as a block-Jacobi approximation of dRdW^T:

    PC(r)_U   ~ (M_U /V)^-T r_U        (few Jacobi-BiCGStab sweeps)
    PC(r)_p   ~ (M_p /V)^-T r_p        (few CG sweeps)
    PC(r)_phi ~ -r_phi                 (d R_phi / d phi = -I)
    PC(r)_nuT ~ (M_sa/V)^-T r_nuT

This is the same operator family the reference's fixed-point adjoint
(runFPAdj, DASimpleFoam.C:189; DATurbulenceModel.H:270-289
constructPseudoNuTildaEqn/solveAdjointFP) sweeps with — used here as a
Krylov preconditioner instead of a standalone smoother. Assembly is exact
(no FD, no coloring) and fully device-resident.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.linalg.krylov import bicgstab, cg
from dafoam_tpu.ops.fvmatrix import FvMatrix, matvec


def transpose(m: FvMatrix) -> FvMatrix:
    """LDU transpose: swap lower/upper (boundary folds sit on the diag)."""
    return FvMatrix(diag=m.diag, lower=m.upper, upper=m.lower,
                    source=m.source)


def _solve_T(m: FvMatrix, r, topo, vol, symmetric=False, iters=15):
    """Approximately solve (M/V)^T x = r:  M^T z = r, x = V z."""
    mt = transpose(m)
    d = mt.diag if mt.diag.ndim == r.ndim else mt.diag[..., None]
    td = jnp.finfo(d.dtype).tiny
    dinv = 1.0 / jnp.where(jnp.abs(d) > td, d, 1.0)

    from dafoam_tpu.ops.fvmatrix import matvec_fn
    mv = matvec_fn(mt, topo)

    def prec(x):
        return dinv * x

    solver = cg if symmetric else bicgstab
    z, _ = solver(mv, r, precond=prec, rel_tol=0.05, max_iters=iters)
    v = vol if r.ndim == 1 else vol[:, None]
    return v * z


def make_block_pc(matrices: dict, topo, geom, state_scales=None,
                  iters=15, identity_fields=("phi",)):
    """Build the GMRES preconditioner callable.

    matrices: {state_name: (FvMatrix, symmetric: bool)} for each field that
    has an assembled operator; fields in identity_fields use -I (R_phi);
    anything else passes through unchanged.

    Works in the SCALED adjoint space used by
    dafoam_tpu.adjoint.solver.adjoint_solve: the scaled operator is
    D_W A^T D_R^-1, so PC = D_R o blockinv(A^T) o D_W^-1.
    """
    scales = state_scales or {}

    def pc(r):
        out = {}
        for k, v in r.items():
            s = scales.get(k, 1.0)
            v = v / s
            if k in matrices:
                m, sym = matrices[k]
                v = _solve_T(m, v, topo, geom.vol, symmetric=sym,
                             iters=iters)
            elif k in identity_fields:
                v = -v
            out[k] = v * s
        return out

    return pc
