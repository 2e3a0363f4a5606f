"""Geometric (Galerkin) multigrid on the dense-DIA grid form.

The reference's primal pressure solve leans on OpenFOAM GAMG
(pEqnSimple.H via lduMatrix solvers, SURVEY.md §3.2) and its adjoint KSP
on ILU(1)+ASM (pyDAFoam.py:526-548) — both grid-independent-strength
approximate inverses. This module is the TPU-native equivalent for
meshes whose dense-DIA layout (mesh/topology.to_dia_dense) is logically a
2-D structured grid: band offsets (1, L) or the periodic O-mesh triple
(1, L-1, L). On such meshes the operator is re-expressed in GRID FORM —
five (nr, L) coefficient planes whose matvec is rolls/shifts + FMAs, no
gathers — and coarsened 2x2 by piecewise-constant Galerkin aggregation
(a 5-point stencil stays 5-point under PWC 2x2 aggregation, and the
periodic wrap seam survives as ordinary roll periodicity).

Smoother: alternating-direction EXACT line solves (batched PCR,
linalg/tridiag) — radial (non-periodic) then wrap (periodic) — which is
robust for the strong, position-dependent anisotropy of stretched
O-meshes. Everything is LINEAR in the RHS with matrix-only coefficients,
so a V-cycle belongs to the same smooth linear-in-defect class as the
ADI sweeps in linalg/lines.py: safe inside reverse-differentiated step
maps (fvsolve.solve_fixed) and as a Krylov preconditioner
(fvsolve.solve pc="mg").
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from dafoam_tpu.linalg.tridiag import pcr_solve, pcr_solve_periodic
from dafoam_tpu.utils.precision import guard_tiny


class GridOp(NamedTuple):
    """Scalar 5-point operator on an (nr, L) logical grid.

    D[r,i]   diagonal of row (r,i)
    Wup[r,i] coef of x[r, (i+1) mod L] in row (r,i)  (wrap +)
    Wdn[r,i] coef of x[r, (i-1) mod L] in row (r,i)  (wrap -)
    Rup[r,i] coef of x[r+1, i] in row (r,i)          (radial +)
    Rdn[r,i] coef of x[r-1, i] in row (r,i)          (radial -)
    periodic: wrap direction is a closed ring (O-mesh) — static flag.
    """
    D: jnp.ndarray
    Wup: jnp.ndarray
    Wdn: jnp.ndarray
    Rup: jnp.ndarray
    Rdn: jnp.ndarray
    periodic: bool


def grid_structure(topo):
    """Detect the logical (nr, L) grid of the dense-DIA layout.

    Returns (L, nr, periodic, band_wrap, band_seam, band_radial) or None.
    Accepts offset sets (1, L) [plain grid] and (1, L-1, L) [periodic
    wrap ring of length L, seam band L-1] — the layouts produced for
    box_hex_mesh / omesh_naca0012 after to_dia_dense.
    """
    dd = topo.dia_dense()
    if dd is None:
        return None
    offs = tuple(int(o) for o in dd[0])
    nc = topo.n_cells
    if len(offs) == 2 and offs[0] == 1:
        L = offs[1]
        if L > 1 and nc % L == 0:
            return L, nc // L, False, 0, None, 1
    if len(offs) == 3 and offs[0] == 1 and offs[1] + 1 == offs[2]:
        L = offs[2]
        if L > 2 and nc % L == 0:
            import numpy as np
            valid = np.asarray(dd[1])
            idx = np.nonzero(valid[1] > 0)[0]
            if idx.size and np.all(idx % L == 0):
                return L, nc // L, True, 0, 1, 2
    return None


def grid_form(m, topo):
    """Re-express an FvMatrix on the dense-DIA layout as a GridOp.

    Dense-layout convention (mesh/topology.to_dia_dense): face k*nc + c
    connects cell c -> c + offs[k]; m.upper[k*nc+c] = coef of x[c+s] in
    row c, m.lower[k*nc+c] = coef of x[c] in row c+s. Returns None when
    the layout is not a recognized 2-D grid.
    """
    gs = grid_structure(topo)
    if gs is None:
        return None
    L, nr, periodic, kw, ks, krad = gs
    nc = topo.n_cells
    up = m.upper.reshape(-1, nc)
    lo = m.lower.reshape(-1, nc)
    D = m.diag.reshape(nr, L)
    upw = up[kw].reshape(nr, L)
    low = lo[kw].reshape(nr, L)
    # Wup[r,i] = coef(row (r,i) -> (r,i+1)); wrap face i exists for i<L-1
    Wup = upw
    # Wdn[r,i] = coef(row (r,i) -> (r,i-1)) = lower of face (r,i-1)
    Wdn = jnp.roll(low, 1, axis=1)
    if periodic:
        ups = up[ks].reshape(nr, L)[:, 0]   # row (r,0) -> (r,L-1)
        los = lo[ks].reshape(nr, L)[:, 0]   # row (r,L-1) -> (r,0)
        Wup = Wup.at[:, L - 1].set(los)
        Wdn = Wdn.at[:, 0].set(ups)
    else:
        Wup = Wup.at[:, L - 1].set(0.0)
        Wdn = Wdn.at[:, 0].set(0.0)
    upr = up[krad].reshape(nr, L)
    lor = lo[krad].reshape(nr, L)
    Rup = upr.at[nr - 1].set(0.0)
    Rdn = jnp.concatenate([jnp.zeros((1, L), lor.dtype), lor[:-1]], axis=0)
    return GridOp(D, Wup, Wdn, Rup, Rdn, periodic)


def grid_matvec(op: GridOp, x):
    """A @ x on the (nr, L) grid: rolls + shifts + FMAs only."""
    y = op.D * x
    if op.periodic:
        y = y + op.Wup * jnp.roll(x, -1, axis=1) \
              + op.Wdn * jnp.roll(x, 1, axis=1)
    else:
        y = y + op.Wup * _shift1(x, -1) + op.Wdn * _shift1(x, 1)
    y = y + op.Rup * _shift0(x, -1) + op.Rdn * _shift0(x, 1)
    return y


def _shift0(x, o):
    """out[r] = x[r - o] with zero fill (axis 0)."""
    if o == 1:
        return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


def _shift1(x, o):
    """out[:, i] = x[:, i - o] with zero fill (axis 1)."""
    if o == 1:
        return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def coarsen(op: GridOp) -> GridOp:
    """Galerkin PWC 2x2 aggregation: A_c = P^T A P with P = piecewise-
    constant prolongation. A 5-point stencil coarsens to a 5-point
    stencil because a fine cell only couples to edge-adjacent aggregates.
    """
    nr, L = op.D.shape

    def q(x):          # (nr, L) -> (nr/2, 2, L/2, 2)
        return x.reshape(nr // 2, 2, L // 2, 2)

    # diagonal: all four diags + intra-aggregate couplings
    D = q(op.D).sum((1, 3)) \
        + q(op.Wup)[:, :, :, 0].sum(1) + q(op.Wdn)[:, :, :, 1].sum(1) \
        + q(op.Rup)[:, 0].sum(2) + q(op.Rdn)[:, 1].sum(2)
    # wrap couplings cross at fine i = 2I+1 (to I+1) / i = 2I (to I-1)
    Wup = q(op.Wup)[:, :, :, 1].sum(1)
    Wdn = q(op.Wdn)[:, :, :, 0].sum(1)
    # radial couplings cross at fine r = 2R+1 (to R+1) / r = 2R (to R-1)
    Rup = q(op.Rup)[:, 1].sum(2)
    Rdn = q(op.Rdn)[:, 0].sum(2)
    return GridOp(D, Wup, Wdn, Rup, Rdn, op.periodic)


def restrict(r):
    nr, L = r.shape
    return r.reshape(nr // 2, 2, L // 2, 2).sum((1, 3))


def prolong(e, shape):
    nr, L = shape
    return jnp.broadcast_to(e[:, None, :, None],
                            (nr // 2, 2, L // 2, 2)).reshape(nr, L)


def _line_solve_radial(op: GridOp, r):
    """Exact solve of (Rdn, D, Rup) tridiagonal along axis 0."""
    return pcr_solve(op.Rdn, op.D, op.Rup, r)


def _line_solve_wrap(op: GridOp, r):
    """Exact solve of the wrap-direction restriction along axis 1
    (periodic for O-meshes)."""
    a = op.Wdn.T     # coef of x[i-1] in row i, lines along axis 0
    b = op.D.T
    c = op.Wup.T
    d = r.T
    z = pcr_solve_periodic(a, b, c, d) if op.periodic else \
        pcr_solve(a, b, c, d)
    return z.T


def smooth(op: GridOp, x, b, sweeps=1):
    """Alternating-direction line smoother: exact radial solve on the
    defect, then exact wrap solve on the updated defect."""
    for _ in range(sweeps):
        x = x + _line_solve_radial(op, b - grid_matvec(op, x))
        x = x + _line_solve_wrap(op, b - grid_matvec(op, x))
    return x


class Hierarchy(NamedTuple):
    levels: tuple      # GridOp per level, fine -> coarse
    shape: tuple       # (nr, L) of the fine level


def build_hierarchy(m, topo, min_cells: int = 64, max_levels: int = 12):
    """Galerkin hierarchy from the fine-grid FvMatrix, or None when the
    mesh has no recognizable grid form."""
    op = grid_form(m, topo)
    if op is None:
        return None
    levels = [op]
    while len(levels) < max_levels:
        nr, L = levels[-1].D.shape
        if nr % 2 or L % 2 or nr < 4 or L < 4 or nr * L <= min_cells:
            break
        levels.append(coarsen(levels[-1]))
    return Hierarchy(tuple(levels), op.D.shape)


def vcycle(h: Hierarchy, r, pre=1, post=1, coarse_sweeps=4, omega=1.0):
    """One V-cycle approximating A^{-1} r (zero initial guess). r, return:
    flat (nc,). Linear in r; coefficients depend on the matrix only.

    omega: coarse-grid-correction over-relaxation — piecewise-constant
    aggregation underestimates the correction for 2nd-order operators
    (the classic aggregation-AMG defect); omega ~ 1.5-1.9 restores most
    of the lost two-grid rate (cf. Notay's over-correction / K-cycles).
    """
    nr, L = h.shape
    x = _vcycle_rec(h.levels, 0, r.reshape(nr, L), pre, post, coarse_sweeps,
                    omega)
    return x.reshape(-1)


def _vcycle_rec(levels, k, b, pre, post, coarse_sweeps, omega):
    op = levels[k]
    z = jnp.zeros_like(b)
    if k == len(levels) - 1:
        return smooth(op, z, b, sweeps=coarse_sweeps)
    z = smooth(op, z, b, sweeps=pre)
    rc = restrict(b - grid_matvec(op, z))
    ec = _vcycle_rec(levels, k + 1, rc, pre, post, coarse_sweeps, omega)
    z = z + omega * prolong(ec, op.D.shape)
    return smooth(op, z, b, sweeps=post)


def mg_solver(m, topo, pre=1, post=1, min_cells: int = 64, omega=1.0):
    """Approximate inverse r -> z ~= M^{-1} r by one V-cycle. Returns None
    when the mesh has no grid form (caller falls back to line/Jacobi).

    NOTE: like the ADI sweep (linalg/lines.py), the V-cycle is a
    NONSYMMETRIC operator (line smoothers don't commute with A) — pair it
    with BiCGStab/FGMRES, not plain CG.
    """
    h = build_hierarchy(m, topo, min_cells=min_cells)
    if h is None:
        return None

    def solve(r):
        return vcycle(h, r, pre=pre, post=post, omega=omega)

    return solve


def transpose_grid(op: GridOp) -> GridOp:
    """GridOp of A^T: swap coupled coefficient planes (for adjoint-side
    preconditioning)."""
    Wup = jnp.roll(op.Wdn, -1, axis=1) if op.periodic else \
        _shift1(op.Wdn, -1)
    Wdn = jnp.roll(op.Wup, 1, axis=1) if op.periodic else \
        _shift1(op.Wup, 1)
    Rup = _shift0(op.Rdn, -1)
    Rdn = _shift0(op.Rup, 1)
    return GridOp(op.D, Wup, Wdn, Rup, Rdn, op.periodic)
