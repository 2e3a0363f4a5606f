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
# ---------------------------------------------------------------------------

def _line_directions(topo):
    """Detect the mesh's line directions from the dense-DIA layout.

    Returns a list of dicts, one per solvable direction:
      {"stride": s, "band": k, "ring": L or None, "seam_band": k2 or None}
    A direction is a band offset s whose stride-s lines tile the flat index
    (s divides n_cells). If another band s2 couples only ring-start cells
    and s + s2 == L with L | n_cells, the stride-s direction is a PERIODIC
    ring of length L (the O-mesh wrap seam) and the seam band joins its
    tridiagonal as cyclic corners.
    """
    dd = topo.dia_dense()
    if dd is None:
        return None
    offs, valid = dd
    import numpy as np
    valid = np.asarray(valid)
    nc = topo.n_cells
    dirs = []
    used_as_seam = set()
    for k, s in enumerate(offs):
        if nc % int(s) != 0:
            continue
        d = {"stride": int(s), "band": k, "ring": None, "seam_band": None}
        # look for a seam band s2 = L - s with L | nc and s2-faces only at
        # cells ≡ 0 (mod L)
        for k2, s2 in enumerate(offs):
            L = int(s) + int(s2)
            if k2 == k or L > nc or nc % L != 0 or int(s2) < int(s):
                continue
            mask = valid[k2] > 0
            idx = np.nonzero(mask)[0]
            if idx.size and np.all(idx % L == 0):
                d["ring"] = L
                d["seam_band"] = k2
                used_as_seam.add(k2)
                break
        dirs.append(d)
    dirs = [d for d in dirs if d["band"] not in used_as_seam]
    # strongest (finest-coupling) direction first: smallest stride is the
    # wrap/in-line neighbour; near-wall anisotropy usually makes the
    # LARGEST-stride (wall-normal) lines stiffest — order by stride
    # descending so the first exact solve captures the stiff direction.
    dirs.sort(key=lambda d: -d["stride"])
    return dirs or None


def line_solver_T(m: FvMatrix, topo, geom, adi_sweeps=1):
    """Exact-by-lines approximate inverse of (M/V)^T.

    Builds, for every detected mesh direction, the tridiagonal restriction
    of M^T (diag + that direction's sub/super bands, plus periodic seam
    corners when present) and solves it EXACTLY with batched PCR
    (linalg.tridiag). Directions are combined ADI-style: each subsequent
    direction solves the updated residual r - M^T z. This is the TPU
    analogue of the reference's ILU(1)+ASM local solves
    (pyDAFoam.py:526-548) — a strong, fully parallel local inverse.

    Returns callable r -> x ~ ((M/V)^T)^{-1} r, or None when the mesh has
    no dense-DIA layout (caller falls back to the Krylov-sweep PC).
    """
    dirs = _line_directions(topo)
    if not dirs:
        return None
    from dafoam_tpu.linalg.tridiag import pcr_solve, pcr_solve_periodic

    nc = topo.n_cells
    mt = transpose(m)
    # dense layout: face k*nc + c connects c -> c + offs[k]
    # M^T super-diagonal (row i, col i+s) = M.lower[band k, cell i]
    # M^T sub-diagonal   (row i, col i-s) = M.upper[band k, cell i-s]
    lo_k = mt.upper.reshape(-1, nc)   # mt.upper == m.lower
    up_k = mt.lower.reshape(-1, nc)   # mt.lower == m.upper

    solves = []
    for d in dirs:
        s, k = d["stride"], d["band"]
        sup = lo_k[k]                         # coef of x[i+s] in row i
        sub = jnp.pad(up_k[k], (s, 0))[:nc]   # coef of x[i-s] in row i
        if d["ring"] is not None:
            L, k2 = d["ring"], d["seam_band"]
            nrings = nc // L
            # rings are contiguous runs of length L with stride s == 1
            a = sub.reshape(nrings, L).T           # (L, nrings)
            c = sup.reshape(nrings, L).T
            # cyclic corners from the seam band: row ring*L has coef of
            # x[ring*L + L-1] = lower[k2] at ring starts; row ring*L+L-1
            # has coef of x[ring*L] = upper[k2] at ring starts
            a = a.at[0].set(lo_k[k2].reshape(nrings, L)[:, 0])
            c = c.at[-1].set(up_k[k2].reshape(nrings, L)[:, 0])
            solves.append(("ring", L, nrings, a, c, pcr_solve_periodic))
        else:
            nlines = nc // s
            a = sub.reshape(nlines, s)             # axis 0 = along line
            c = sup.reshape(nlines, s)
            solves.append(("line", s, nlines, a, c, pcr_solve))

    diag = mt.diag
    mv = matvec_fn(mt, topo)

    def _dir_solve(entry, r):
        kind, s, n0, a, c, fn = entry
        extra = r.shape[1:]           # () or (3,)
        if kind == "ring":
            L, nrings = s, n0
            b = diag.reshape((nrings, L) + extra)
            b = jnp.moveaxis(b, 1, 0)
            d_ = jnp.moveaxis(r.reshape((nrings, L) + extra), 1, 0)
            z = fn(a, b, c, d_)
            return jnp.moveaxis(z, 0, 1).reshape(r.shape)
        nlines = n0
        b = diag.reshape((nlines, s) + extra)
        d_ = r.reshape((nlines, s) + extra)
        z = fn(a, b, c, d_)
        return z.reshape(r.shape)

    def solve(r):
        z = _dir_solve(solves[0], r)
        for _ in range(adi_sweeps):
            for entry in solves[1:] + (solves[:1] if adi_sweeps > 1 else []):
                rho = r - mv(z)
                z = z + _dir_solve(entry, rho)
        v = geom.vol if r.ndim == 1 else geom.vol[:, None]
        return v * z

    return solve


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
