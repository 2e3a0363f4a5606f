"""Solve one FvMatrix equation (the primal's segregated sub-solves).

Plays the role of OpenFOAM's ``fvMatrix::solve()`` inside the reference's
primal loops (UEqnSimple.H `solve(UEqn == -fvc::grad(p))`, pEqnSimple.H
`pEqn.solve()`): symmetric systems (pressure) go to diagonally-preconditioned
CG, asymmetric (momentum/turbulence) to BiCGStab.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg.krylov import (SolveInfo, bicgstab, bicgstab_steps,
                                      cg, cg_steps, chebyshev_steps,
                                      jacobi_steps)
from dafoam_tpu.ops.fvmatrix import FvMatrix, matvec
from dafoam_tpu.utils.precision import guard_tiny


def _diag_like(m: FvMatrix, psi):
    d = m.diag
    if d.ndim != psi.ndim:
        d = d[..., None] if d.ndim < psi.ndim else d
    return d


def _component_major_ok(m: FvMatrix, psi0, topo) -> bool:
    """Vector (nc,C) solves run TRANSPOSED, component-major (C,nc), inside
    the Krylov loop: (nc,3) occupies 3 of 128 VPU lanes on TPU and
    lane-pads every HBM tile, so all momentum matvecs/dots/axpys run far
    below peak; (C,nc) keeps full lanes. Entry/exit transposes are
    amortized over all iterations. Needs the banded layout with scalar
    shared bands; the halo (multi-chip) route keeps cell-major."""
    if psi0.ndim != 2 or m.diag.ndim != 1:
        return False
    from dafoam_tpu.ops.fvmatrix import _active_halo
    if _active_halo(topo) is not None:
        return False
    return topo.dia() is not None


# Trace-scoped switch: inside fixed_inner(), every fvsolve.solve — in the
# solver's own step AND inside turbulence-model correct()s — dispatches to
# solve_fixed with n_iters = scale * max_iters. The fixed-point adjoint
# wraps the step map in this context so the whole map is cheap, smooth,
# and exactly reverse-differentiable (see solve_fixed). Matching the
# primal's own max_iters (scale=1) preserves the primal's contraction.
_FIXED_INNER: list = []


@contextlib.contextmanager
def fixed_inner(scale: float = 1.0, smoother: str = "linear"):
    _FIXED_INNER.append((float(scale), str(smoother)))
    try:
        yield
    finally:
        _FIXED_INNER.pop()


def solve(m: FvMatrix, psi0, topo, symmetric=False, rel_tol=1e-7,
          abs_tol=1e-50, max_iters=500, rhs=None,
          trans_rel_tol=None, trans_max_iters=None, pc: str = "jacobi"):
    """Solve M x = source (+rhs) starting from psi0. Returns (x, SolveInfo).

    pc="line" (primalLinearSolver.pPC) preconditions with exact ADI line
    solves on the dense-DIA layout (linalg/lines.py) — the GAMG-class
    strength the pressure equation needs at scale: Jacobi-CG requires
    O(N^(1/2)) iterations on a 2-D Poisson operator, so at 512x512 the
    per-outer pressure tolerance is unreachable within any sane budget
    and SIMPLE creeps (scripts/tpu_primal_floor_probe.py: ~1 residual
    decade per 10k outers). The ADI sweep is nonsymmetric, so the solver
    switches to BiCGStab even for symmetric systems. Falls back to
    Jacobi when the mesh has no dense-DIA layout.

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
    if _FIXED_INNER:
        scale, smoother = _FIXED_INNER[-1]
        n = max(1, int(round(scale * max_iters)))
        x = solve_fixed(m, psi0, topo, symmetric=symmetric, n_iters=n,
                        rhs=rhs, smoother=smoother)
        zero = jnp.zeros((), x.dtype)
        return x, SolveInfo(jnp.asarray(n), zero, zero, jnp.asarray(True))

    b = m.source if rhs is None else m.source + rhs
    cm = _component_major_ok(m, psi0, topo)
    if cm:
        b = b.T
        d = m.diag[None, :]
    else:
        d = _diag_like(m, psi0)
    td = guard_tiny(d.dtype)
    dinv = 1.0 / jnp.where(jnp.abs(d) > td, d, 1.0)

    from dafoam_tpu.ops.fvmatrix import matvec_fn
    # the operator handed to custom_linear_solve must be LINEAR-
    # TRANSPOSABLE by jax (the primitive transposes it eagerly at trace
    # time) — pallas closures are not; the fast kernel is used inside the
    # forward solver loop instead (fwd below), which is a black box to AD
    mv = matvec_fn(m, topo, pallas=False, component_major=cm)
    mv_fast = matvec_fn(m, topo, component_major=cm)

    def prec(r):
        return dinv * r

    prec_t = prec
    solver = cg if symmetric else bicgstab
    if pc == "mg":
        # geometric multigrid PC (linalg/mg.py) — the GAMG-class inverse
        # the reference's pressure solve gets from OpenFOAM GAMG
        # (pEqnSimple.H). Scalar equations on grid-form meshes only;
        # falls back to the ADI line PC otherwise.
        from dafoam_tpu.linalg import mg as mgmod
        if m.diag.ndim == 1 and mgmod.grid_structure(topo) is not None:
            sg = jax.lax.stop_gradient
            mmg = m._replace(diag=sg(m.diag), lower=sg(m.lower),
                             upper=sg(m.upper))
            h = mgmod.build_hierarchy(mmg, topo)
            mgp = lambda r: mgmod.vcycle(h, r, omega=1.7)  # noqa: E731
            prec = (lambda r: mgp(r.T).T) if cm else mgp
            from dafoam_tpu.adjoint.precond import transpose
            ht = mgmod.build_hierarchy(transpose(mmg), topo)
            mgt = lambda r: mgmod.vcycle(ht, r, omega=1.7)  # noqa: E731
            prec_t = (lambda r: mgt(r.T).T) if cm else mgt
            solver = bicgstab  # V-cycle is nonsymmetric
            pc = "done"
        else:
            pc = "line"
    if pc == "line":
        from dafoam_tpu.linalg.lines import line_directions, line_solver
        if line_directions(topo):
            # the line PC operates in CELL-major space; wrap for cm.
            # stop_gradient: the PC only shapes the iterate path, and
            # differentiating PCR's guarded divides is wasted tape.
            sg = jax.lax.stop_gradient
            mline = m._replace(diag=sg(m.diag), lower=sg(m.lower),
                               upper=sg(m.upper))
            lp = line_solver(mline, topo)
            prec = (lambda r: lp(r.T).T) if cm else lp
            from dafoam_tpu.adjoint.precond import transpose
            lpt = line_solver(transpose(mline), topo)
            prec_t = (lambda r: lpt(r.T).T) if cm else lpt
            solver = bicgstab  # ADI sweep is nonsymmetric

    # stop_gradient: psi0/preconditioner influence only the iterate path,
    # not the solution the implicit rule differentiates
    x0 = jax.lax.stop_gradient(psi0.T if cm else psi0)

    def fwd(matvec_f, bb):
        # matvec_f == mv semantically; the closed-over fast closure may
        # route through the Pallas DIA kernel on TPU. MUST be a pure
        # function of bb (start from ZERO, tolerance relative to bb's own
        # residual): custom_linear_solve reuses this solve for JVP tangent
        # systems, whose RHS can be orders of magnitude smaller than the
        # state — warm-starting from psi0 there made rel_tol relative to
        # ||A psi0|| and returned scale-contaminated tangents (caught by
        # test_cht's forward-AD triangulation). The primal warm start
        # lives OUTSIDE the primitive in correction form below.
        x, _ = solver(mv_fast, bb, precond=prec, rel_tol=rel_tol,
                      abs_tol=abs_tol, max_iters=max_iters)
        return x

    t_rel = min(rel_tol, 1e-10) if trans_rel_tol is None else trans_rel_tol
    t_max = max(max_iters, 1000) if trans_max_iters is None \
        else trans_max_iters

    def trans(vecmat_f, bb):
        # diag(M^T) == diag(M): Jacobi carries over; the line PC uses the
        # transposed band restriction
        x, _ = solver(vecmat_f, bb, precond=prec_t, rel_tol=t_rel,
                      abs_tol=abs_tol, max_iters=t_max)
        return x

    # correction (defect) form x = x0 + A^-1 (b - A x0): the warm start is
    # outside custom_linear_solve, so the primal solve does the same work
    # as a psi0-warm-started one (tolerance relative to ||b - A x0||)
    # while JVP/VJP rules see a solve that is exact in its RHS. AD-wise
    # this is exact: d x = A^-1 (db - dA (x0 + delta)) = A^-1 (db - dA x).
    delta = jax.lax.custom_linear_solve(mv, b - mv(x0), fwd,
                                        transpose_solve=trans,
                                        symmetric=symmetric)
    x = x0 + delta
    if cm:
        x = x.T
    # per-solve iteration stats cannot escape the custom_linear_solve
    # primitive; outer-loop convergence control uses
    # initial_residual_norm, so no caller needs them (and recomputing the
    # residual here would cost one extra matvec per inner solve)
    zero = jnp.zeros((), x.dtype)
    return x, SolveInfo(jnp.asarray(-1), zero, zero, jnp.asarray(True))


def solve_fixed(m: FvMatrix, psi0, topo, symmetric=False, n_iters=20,
                rhs=None, smoother="linear"):
    """FIXED-ITERATION approximate solve (lax.scan; no custom_linear_solve,
    no convergence exit) — the smoother variant of ``solve`` used by the
    fixed-point adjoint's step map.

    Plain reverse AD through the scan is the EXACT transpose of the map
    actually computed, at ~2x forward cost — no tight implicit-function
    transpose solves needed. At a converged primal any smooth approximate
    inverse C gives exact totals (the dC*R terms carry a factor R ~ 0),
    so the fixed-point adjoint built on this step map matches the Krylov
    adjoint to solver tolerance while each (I - dG^T) product costs only
    a few smoother sweeps. Static trip counts also compile to tight,
    pipelined TPU loops (no while_loop divergence).

    smoother="linear" (default): defect-correction with FIXED, data-
    independent coefficients — Chebyshev on the Jacobi-preconditioned
    operator for symmetric (pressure) equations, damped Jacobi otherwise.
    Linear in the defect b - A psi0, so the map stays smooth AND its AD
    transpose stays finite even when the defect sits at the dtype's noise
    floor — which it always does at a warm-started converged state. The
    Krylov steppers' <r,z>/<p,Ap> coefficient ratios turn into
    differentiated noise there and NaN in f32 (the TPU bench dtype); see
    cg_steps/bicgstab_steps freeze notes. Also dot-product-free: each
    sweep is halo-local on a sharded mesh (no ICI reductions).
    smoother="line": defect-correction with the exact ADI line solve
    (linalg/lines.py) as the approximate inverse — the same linear-in-
    defect class (the PCR coefficients depend on the MATRIX, not the
    defect), but with GAMG-grade contraction per sweep. This is what
    keeps the fixed-point step map G strongly contracting at scale: with
    Jacobi/Chebyshev smoothers the 512x512 step map has rho(dG) ~ 0.999
    and the adjoint GMRES on (I - dG^T) crawls; line sweeps restore the
    ideal SIMPLE rate. Falls back to "linear" without a dense-DIA layout.
    smoother="krylov": the frozen-on-convergence CG/BiCGStab step scans
    (stronger contraction per step; f64-safe).
    """
    b = m.source if rhs is None else m.source + rhs
    cm = _component_major_ok(m, psi0, topo)
    x0 = psi0.T if cm else psi0
    if cm:
        b = b.T
        d = m.diag[None, :]
    else:
        d = _diag_like(m, psi0)

    from dafoam_tpu.ops.fvmatrix import matvec_fn
    mv = matvec_fn(m, topo, component_major=cm)

    # FROZEN approximate inverse: every smoother below is written
    # strictly as  x = x0 + C(b - A x0)  with C built from a
    # stop_gradient'ed copy of the matrix (and frozen internal defect
    # matvecs), while the OUTER defect keeps the live matrix. All
    # dropped derivative paths carry the defect factor (b - A x ~ R -> 0
    # at a converged primal), so totals are unchanged at solver
    # tolerance — but the reverse sweep no longer differentiates the
    # PCR/Chebyshev coefficient algebra w.r.t. the matrix, which is
    # numerically UNSTABLE: the live-C vjp of this step map differed by
    # 30% (p/nuTilda rows) between eager and jit op orderings on the
    # NACA-SA O-mesh (f64!), scattering fp-adjoint totals by ~2e-3
    # across equally-converged solves. Frozen C is also a shorter tape.
    sg = jax.lax.stop_gradient
    msg = m._replace(diag=sg(m.diag), lower=sg(m.lower), upper=sg(m.upper))
    mv_f = matvec_fn(msg, topo, component_major=cm)
    d_f = sg(d)
    td = guard_tiny(d_f.dtype)
    dinv = 1.0 / jnp.where(jnp.abs(d_f) > td, d_f, 1.0)

    if smoother == "mg":
        # geometric-multigrid defect correction (linalg/mg.py): the same
        # linear-in-defect smooth class as "line" (coefficients depend on
        # the MATRIX only) but with grid-independent contraction — this
        # is what keeps the fixed-point step map G strongly contracting
        # at bench scale (VERDICT r3 item 1: with line/Jacobi smoothers
        # the 512x512 adjoint GMRES on (I - dG^T) stalls at rel 1.8e-2).
        # Scalar equations only (pressure), same rationale as "line".
        from dafoam_tpu.linalg import mg as mgmod
        if x0.ndim == 1 and mgmod.grid_structure(topo) is not None:
            h = mgmod.build_hierarchy(msg, topo)
            sweeps = max(1, min(2, int(round(n_iters / 15))))
            r = b - mv(x0)           # live defect
            c = mgmod.vcycle(h, r, omega=1.7)
            for _ in range(sweeps - 1):
                c = c + mgmod.vcycle(h, r - mv_f(c), omega=1.7)
            x = x0 + c
            return x.T if cm else x
        smoother = "line"  # no grid form: fall through to ADI lines

    if smoother == "line":
        from dafoam_tpu.linalg.lines import line_directions
        # SCALAR equations only (pressure — where the stiffness lives):
        # the PCR vjp on (nlines, s, 3) momentum batches rematerializes
        # (.,3)-minor temps that XLA lays out T(8,128) with 42.7x padding
        # and OOMs HBM at bench scale; relaxed momentum is diagonally
        # dominant and the damped-Jacobi smoother contracts it fine.
        if x0.ndim == 1 and line_directions(topo):
            # ALGORITHMIC transpose via linear_call: the mechanical AD
            # transpose of the PCR recurrences is numerically unstable —
            # measured 30% eager-vs-jit vjp differences (p/nuTilda rows)
            # on the stretched NACA O-mesh in f64, scattering fp-adjoint
            # totals ~2e-3 across equally-converged solves. The EXACT
            # transpose of the defect-correction ADI composition
            # F = L_n + (I - L_n M) F_{n-1} is the same algorithm on M^T
            # with the direction order REVERSED (induction on n), each
            # tridiagonal solved by the same forward-stable PCR.
            from jax import custom_derivatives as _cd

            from dafoam_tpu.linalg.lines import (apply_line_solve,
                                                 build_line_solves)
            from dafoam_tpu.ops.fvmatrix import matvec_fn as _mvfn
            # linear_call residual operands must carry ZERO tangents:
            # diag/lower/upper are already stop_gradient'ed above, but
            # m.source is deliberately live (the defect path) — freeze a
            # copy for the solve closures (they never read source)
            msg_lc = msg._replace(source=sg(msg.source))
            msgT = msg_lc._replace(lower=msg.upper, upper=msg.lower)

            def _lp_fwd(mats, rr):
                m1, _ = mats
                sv = build_line_solves(m1, topo)
                mv1 = _mvfn(m1, topo)
                z = apply_line_solve(sv[0], m1.diag, rr)
                for e in sv[1:]:
                    z = z + apply_line_solve(e, m1.diag, rr - mv1(z))
                return z

            def _lp_T(mats, ct):
                _, m2 = mats
                sv = build_line_solves(m2, topo)
                mv2 = _mvfn(m2, topo)
                z = apply_line_solve(sv[-1], m2.diag, ct)
                for e in reversed(sv[:-1]):
                    z = z + apply_line_solve(e, m2.diag, ct - mv2(z))
                return z

            def lp(rr):
                return _cd.linear_call(_lp_fwd, _lp_T, (msg_lc, msgT), rr)

            # one ADI sweep ~ a dozen matvec-equivalents; budget sweeps
            # against the requested smoother-iteration count
            sweeps = max(1, min(4, int(round(n_iters / 10))))
            r = b - mv(x0)           # live defect
            c = lp(r)
            for _ in range(sweeps - 1):
                c = c + lp(r - mv_f(c))
            return x0 + c
        smoother = "linear"  # vector eq / no dense-DIA layout: fall back

    if smoother == "linear":
        r0 = b - mv(x0)              # live defect
        if symmetric:
            # certain Gershgorin bound for lam(D^-1 A) computed from the
            # FROZEN matrix: the static 2.2 default assumes weak diagonal
            # dominance, but non-orthogonal corrections push a few rows
            # of the stretched O-mesh pressure operator past it — and a
            # k-step Chebyshev polynomial evaluated OUTSIDE its target
            # interval grows like cosh(k acosh(1+eps)): at k=80 a 10%
            # spectrum excess amplifies those modes ~1e20, making the
            # smoother (and its AD transpose) catastrophically
            # cancellation-sensitive — measured as O(1) eager-vs-jit vjp
            # differences at seam cells and ~2e-3 fp-adjoint totals
            # scatter on the 48x16 NACA mesh.
            ni = topo.n_internal
            row_off = jnp.zeros(topo.n_cells, msg.diag.dtype)
            row_off = row_off.at[topo.owner[:ni]].add(jnp.abs(msg.upper))
            row_off = row_off.at[topo.neighbour].add(jnp.abs(msg.lower))
            dabs = jnp.abs(msg.diag)
            lam_hi = 1.0 + jnp.max(
                row_off / jnp.maximum(dabs, guard_tiny(dabs.dtype)))
            x = x0 + chebyshev_steps(mv_f, dinv, r0, n_steps=int(n_iters),
                                     lam_max=1.05 * lam_hi)
        else:
            # LIVE matrix in the damped-Jacobi scan (momentum/turbulence
            # equations). The round-4 freeze (mv_f) was motivated by the
            # PCR/Chebyshev COEFFICIENT-algebra vjp instability — which
            # does not exist here: the Jacobi polynomial's matrix
            # dependence is plain bilinear products (dinv stays frozen).
            # Freezing this scan cost 4x on the TPU bench: the frozen
            # replay de-fuses in the fp-GMRES while_loop body and the
            # per-product cost went 27 -> 110 ms at 512x512; live
            # restores 24.9 ms (scripts/adjoint_exp_r5.py, r5 A/B).
            # FVSOLVE_FROZEN_JACOBI=1 restores the frozen variant for
            # experiments.
            _frozen = os.environ.get("FVSOLVE_FROZEN_JACOBI", "0") == "1"
            x = x0 + jacobi_steps(mv_f if _frozen else mv, dinv, r0,
                                  n_steps=int(n_iters))
        return x.T if cm else x

    def prec(r):
        return dinv * r

    stepper = cg_steps if symmetric else bicgstab_steps
    # krylov smoother: frozen-matrix steps on the live defect
    r0 = b - mv(x0)
    c = stepper(mv_f, r0, x0=jnp.zeros_like(x0), precond=prec,
                n_steps=int(n_iters))
    x = x0 + c
    return x.T if cm else x


def initial_residual_norm(m: FvMatrix, psi, topo, rhs=None):
    """OpenFOAM-style normalized initial residual (for convergence control,
    reference DAUtility::primalResidualControl)."""
    b = m.source if rhs is None else m.source + rhs
    ax = matvec(m, psi, topo)
    xbar = jnp.mean(psi, axis=0, keepdims=True)
    axbar = matvec(m, jnp.broadcast_to(xbar, psi.shape), topo)
    norm = jnp.sum(jnp.abs(ax - axbar)) + jnp.sum(jnp.abs(b - axbar))
    return jnp.sum(jnp.abs(b - ax)) / jnp.maximum(norm, guard_tiny(norm.dtype))
