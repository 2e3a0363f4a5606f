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

from dafoam_tpu.utils.precision import guard_tiny

from dafoam_tpu.linalg.krylov import bicgstab, cg
from dafoam_tpu.ops.fvmatrix import FvMatrix, matvec, matvec_fn  # noqa: F401


def transpose(m: FvMatrix) -> FvMatrix:
    """LDU transpose: swap lower/upper (boundary folds sit on the diag)."""
    return FvMatrix(diag=m.diag, lower=m.upper, upper=m.lower,
                    source=m.source)


def _solve_T(m: FvMatrix, r, topo, vol, symmetric=False, iters=15):
    """Approximately solve (M/V)^T x = r:  M^T z = r, x = V z."""
    mt = transpose(m)
    d = mt.diag if mt.diag.ndim == r.ndim else mt.diag[..., None]
    td = guard_tiny(d.dtype)
    dinv = 1.0 / jnp.where(jnp.abs(d) > td, d, 1.0)

    from dafoam_tpu.ops.fvmatrix import matvec_fn
    mv = matvec_fn(mt, topo)

    def prec(x):
        return dinv * x

    solver = cg if symmetric else bicgstab
    z, _ = solver(mv, r, precond=prec, rel_tol=0.05, max_iters=iters)
    v = vol if r.ndim == 1 else vol[:, None]
    return v * z


# ---------------------------------------------------------------------------
# Line-implicit (ADI) per-equation solves on the dense-DIA banded layout
# (machinery shared with the PRIMAL pressure preconditioner: linalg/lines.py)
# ---------------------------------------------------------------------------

def line_solver_T(m: FvMatrix, topo, geom, adi_sweeps=1):
    """Exact-by-lines approximate inverse of (M/V)^T.

    Builds, for every detected mesh direction, the tridiagonal restriction
    of M^T (diag + that direction's sub/super bands, plus periodic seam
    corners when present) and solves it EXACTLY with batched PCR
    (linalg.tridiag), directions combined ADI-style — see
    linalg/lines.line_solver, applied here to transpose(m) with the /V
    normalization the adjoint operator carries. This is the TPU analogue
    of the reference's ILU(1)+ASM local solves (pyDAFoam.py:526-548).

    Returns callable r -> x ~ ((M/V)^T)^{-1} r, or None when the mesh has
    no dense-DIA layout (caller falls back to the Krylov-sweep PC).
    """
    from dafoam_tpu.linalg.lines import line_solver

    mt = transpose(m)
    base = line_solver(mt, topo, adi_sweeps=adi_sweeps,
                       matvec=matvec_fn(mt, topo))
    if base is None:
        return None

    def solve(r):
        z = base(r)
        v = geom.vol if r.ndim == 1 else geom.vol[:, None]
        return v * z

    return solve


def _solve_F(m: FvMatrix, r, topo, vol, symmetric=False, iters=15):
    """Approximately solve (M/V) x = r:  M x = V r (forward twin of
    _solve_T, for the UNtransposed linearized system dR/dW that
    forward_total_derivative's tangent GMRES iterates)."""
    d = m.diag if m.diag.ndim == r.ndim else m.diag[..., None]
    td = guard_tiny(d.dtype)
    dinv = 1.0 / jnp.where(jnp.abs(d) > td, d, 1.0)

    from dafoam_tpu.ops.fvmatrix import matvec_fn
    mv = matvec_fn(m, topo)

    def prec(x):
        return dinv * x

    solver = cg if symmetric else bicgstab
    v = vol if r.ndim == 1 else vol[:, None]
    z, _ = solver(mv, v * r, precond=prec, rel_tol=0.05, max_iters=iters)
    return z


def line_solver_F(m: FvMatrix, topo, geom, adi_sweeps=1):
    """Line-implicit approximate inverse of (M/V) (forward twin of
    line_solver_T). Returns None without a dense-DIA layout."""
    from dafoam_tpu.linalg.lines import line_solver

    base = line_solver(m, topo, adi_sweeps=adi_sweeps,
                       matvec=matvec_fn(m, topo))
    if base is None:
        return None

    def solve(r):
        v = geom.vol if r.ndim == 1 else geom.vol[:, None]
        return base(v * r)

    return solve


def build_forward_pc(mats: dict, topo, geom, opt: dict,
                     identity_fields=("phi",)):
    """Block preconditioner for the FORWARD linearized system dR/dW
    (unscaled — forward_total_derivative solves it in raw residual form;
    reference analog: the ADF build's tangent solve). Same per-equation
    block approximation as build_pc, untransposed. Without it the
    unpreconditioned tangent GMRES stalls (e.g. rho channel: 3000 iters
    at rel 4.4e-8 vs target 1e-10 -> forward totals off at 5e-5, caught
    by the adjoint/forward triangulation oracles)."""
    pctype = opt.get("pcType", "segregated")
    # default 2x the adjoint PC's budget (floor 30): BiCGStab's
    # best-so-far on convection-dominated blocks (e.g. the rho-channel T
    # equation) rides a nonsymmetric residual transient for ~20
    # iterations before dropping — at 15 the best iterate is still the
    # zero start and the block becomes a silent no-op (which then
    # zeroes a GMRES basis vector and NaNs the solve)
    iters = int(opt.get("pcFwdInnerIters",
                        max(30, 2 * int(opt.get("pcInnerIters", 15)))))
    blockinvs = {}
    for k, (m, sym) in mats.items():
        sv = None
        if pctype in ("coupledLine", "lineJacobi"):
            sv = line_solver_F(m, topo, geom,
                               adi_sweeps=int(opt.get("pcADISweeps", 1)))
        if sv is None:
            def sv(r, m=m, sym=sym):
                return _solve_F(m, r, topo, geom.vol, symmetric=sym,
                                iters=iters)
        blockinvs[k] = sv

    # RAW-space PC (r -> ~A^-1 r); when forward_total_derivative solves
    # the NORMALIZED tangent system, base.forward_total_derivative wraps
    # this in the D_W^-1 o (.) o D_R scale adapters generically
    def pc(r):
        out = {}
        for k, v in r.items():
            if k in blockinvs:
                v = blockinvs[k](v)
            elif k in identity_fields:
                v = -v
            out[k] = v
        return out

    return pc


def make_coupled_pc(blockinvs: dict, state_scales=None, sweeps=2,
                    identity_fields=("phi",)):
    """Coupled block-Gauss–Seidel preconditioner FACTORY.

    Unlike make_block_pc (block-diagonal: each field inverted in
    isolation), this couples the fields through the FULL scaled transposed
    Jacobian: the returned factory receives the operator matT that FGMRES
    itself applies (one residual-vjp per call) and performs

        psi   = Binv(r)
        psi  += Binv(r - matT psi)     (sweeps-1 times)

    where Binv is the per-field line-implicit inverse. This is exactly the
    reference's fixed-point adjoint smoother (runFPAdj block Gauss–Seidel,
    DASimpleFoam.C:189, DATurbulenceModel.H:270-289) used as a flexible-
    GMRES preconditioner: the off-diagonal dR_U/dp-type couplings the
    segregated PC drops are applied exactly by the vjp.

    blockinvs: {field: callable r->x} (from line_solver_T or _solve_T
    closures); fields in identity_fields use -I; others pass through.
    """
    scales = state_scales or {}

    def blockapply(r):
        out = {}
        for k, v in r.items():
            s = scales.get(k, 1.0)
            v = v / s
            if k in blockinvs and blockinvs[k] is not None:
                v = blockinvs[k](v)
            elif k in identity_fields:
                v = -v
            out[k] = v * s
        return out

    def factory(matT):
        def pc(r):
            psi = blockapply(r)
            for _ in range(max(0, sweeps - 1)):
                rho = {k: r[k] - v for k, v in matT(psi).items()}
                upd = blockapply(rho)
                psi = {k: psi[k] + upd[k] for k in psi}
            return psi
        return pc

    factory.needs_opT = True
    return factory


def build_pc(mats: dict, topo, geom, state_scales, opt: dict,
             identity_fields=("phi",)):
    """Dispatch on adjEqnOption.pcType — the one entry point solvers call.

    pcType:
      "segregated"  — block-diagonal, inner Krylov sweeps (make_block_pc;
                      round-2 behaviour, kept as fallback)
      "lineJacobi"  — block-diagonal, exact per-field line-implicit solves
      "coupledLine" — line-implicit blocks + pcCoupledSweeps block-GS
                      sweeps through the full transposed Jacobian (the
                      strong PC; reference analogue: assembled dRdWTPC
                      through ILU+ASM, pyDAFoam.py:526-548)
    """
    pctype = opt.get("pcType", "segregated")
    iters = int(opt.get("pcInnerIters", 15))
    if pctype in ("coupledLine", "lineJacobi"):
        blockinvs = {}
        for k, (m, sym) in mats.items():
            sv = line_solver_T(m, topo, geom,
                               adi_sweeps=int(opt.get("pcADISweeps", 1)))
            if sv is None:
                def sv(r, m=m, sym=sym):
                    return _solve_T(m, r, topo, geom.vol, symmetric=sym,
                                    iters=iters)
            blockinvs[k] = sv
        sweeps = 1 if pctype == "lineJacobi" else \
            int(opt.get("pcCoupledSweeps", 2))
        return make_coupled_pc(blockinvs, state_scales=state_scales,
                               sweeps=sweeps,
                               identity_fields=identity_fields)
    return make_block_pc(mats, topo, geom, state_scales=state_scales,
                         iters=iters, identity_fields=identity_fields)


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
