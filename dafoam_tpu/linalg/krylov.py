"""Matrix-free Krylov solvers, fully device-resident (lax.while_loop).

Replaces both OpenFOAM's lduMatrix solvers (PBiCGStab/PCG/GAMG used by the
reference's primal, e.g. pEqnSimple.H pEqn.solve()) and the PETSc GMRES+ASM
/ILU stack used for the adjoint (reference
src/adjoint/DALinearEqn/DALinearEqn.C:28-341). All solvers:

- work on arbitrary pytrees (momentum solves carry (nc,3), adjoint solves
  carry the full state pytree);
- take ``matvec`` and optional left/right preconditioner callables;
- never sync to host: convergence checks are traced (`lax.while_loop`), so
  the whole primal/adjoint pipeline stays one XLA program.

Under SPMD sharding, the dot products here become ``psum`` automatically
when run inside shard_map / with sharded inputs — the TPU equivalent of
PETSc's distributed Vec dots (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp


class SolveInfo(NamedTuple):
    iters: jnp.ndarray
    resid0: jnp.ndarray
    resid: jnp.ndarray
    converged: jnp.ndarray


# ---------------------------------------------------------------------------
# pytree vector helpers
# ---------------------------------------------------------------------------

def _tmap(f, *ts):
    return jax.tree_util.tree_map(f, *ts)


def tdot(a, b):
    leaves = jax.tree_util.tree_leaves(_tmap(lambda x, y: jnp.sum(x * y), a, b))
    return functools.reduce(jnp.add, leaves)


def tnorm(a):
    return jnp.sqrt(tdot(a, a))


def taxpy(alpha, x, y):
    return _tmap(lambda xi, yi: alpha * xi + yi, x, y)


def tscale(alpha, x):
    return _tmap(lambda xi: alpha * xi, x)


def tzeros_like(x):
    return _tmap(jnp.zeros_like, x)


def _tiny(x):
    """Smallest normal of x's dtype ON THE ACTIVE BACKEND: breakdown guards
    must scale with the working precision (1e-300 flushes to 0 in f32; a
    fixed 1e-36 clamps legitimately tiny f64 dot products 250 orders of
    magnitude too high) — and with the backend's exponent range: TPU f64 is
    double-float emulation where finfo(f64).tiny itself flushes to 0
    (utils/precision.py), which turned these guards into no-ops and NaN'd
    the f64-on-TPU adjoint (round-2 VERDICT item 2)."""
    from dafoam_tpu.utils.precision import guard_tiny
    return guard_tiny(jnp.asarray(x).dtype)


def _identity(x):
    return x


# ---------------------------------------------------------------------------
# Conjugate Gradient (SPD systems: pressure Poisson)
# ---------------------------------------------------------------------------

def cg(matvec: Callable, b, x0=None, precond: Callable | None = None,
       rel_tol=1e-6, abs_tol=1e-50, max_iters=500):
    precond = precond or _identity
    x = tzeros_like(b) if x0 is None else x0
    r = _tmap(lambda bi, ax: bi - ax, b, matvec(x))
    z = precond(r)
    p = z
    rz = tdot(r, z)
    r0 = tnorm(r)
    tol = jnp.maximum(rel_tol * r0, abs_tol)

    def cond(s):
        x, r, z, p, rz, it = s
        return jnp.logical_and(it < max_iters, tnorm(r) > tol)

    def body(s):
        x, r, z, p, rz, it = s
        ap = matvec(p)
        # sign-preserving guards: the pressure laplacian is symmetric
        # NEGATIVE definite (OpenFOAM convention) and CG is invariant under
        # simultaneous negation — as long as we never clamp signs away.
        pap = tdot(p, ap)
        tp = _tiny(pap)
        alpha = rz / jnp.where(jnp.abs(pap) > tp, pap, tp)
        x = taxpy(alpha, p, x)
        r = taxpy(-alpha, ap, r)
        z = precond(r)
        rz_new = tdot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) > tp, rz, tp)
        p = taxpy(beta, p, z)
        return x, r, z, p, rz_new, it + 1

    x, r, z, p, rz, it = jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, jnp.asarray(0)))
    rn = tnorm(r)
    return x, SolveInfo(it, r0, rn, rn <= tol)


# ---------------------------------------------------------------------------
# BiCGStab (non-symmetric: momentum / turbulence transport)
# ---------------------------------------------------------------------------

def bicgstab(matvec: Callable, b, x0=None, precond: Callable | None = None,
             rel_tol=1e-6, abs_tol=1e-50, max_iters=200):
    """Preconditioned BiCGStab with breakdown restarts and best-so-far
    tracking. BiCGStab's recursion is rounding-sensitive: under SPMD
    sharding the reduction order changes by shard boundaries, and a naive
    implementation can hit rho/omega breakdowns that poison the iterate
    with NaN (observed as sharded-primal divergence). On breakdown the
    method restarts from the current residual; non-finite trial iterates
    are rejected in favour of the best finite one."""
    precond = precond or _identity
    x = tzeros_like(b) if x0 is None else x0
    r = _tmap(lambda bi, ax: bi - ax, b, matvec(x))
    r0n = tnorm(r)
    tol = jnp.maximum(rel_tol * r0n, abs_tol)
    one = jnp.asarray(1.0, dtype=r0n.dtype)
    zero_t = tzeros_like(b)
    # state: x, r, rhat, p, v, rho, alpha, omega, best_x, best_rn, it, fresh
    state = (x, r, r, zero_t, zero_t, one, one, one, x, r0n,
             jnp.asarray(0), jnp.asarray(True))

    def cond(s):
        it, = (s[10],)
        rn = tnorm(s[1])
        ok = jnp.isfinite(rn)
        return jnp.logical_and(it < max_iters,
                               jnp.logical_and(ok, rn > tol))

    def body(s):
        x, r, rhat, p, v, rho, alpha, omega, bx, brn, it, fresh = s
        rho_new = tdot(rhat, r)
        rn2 = tdot(r, r)
        # serious breakdown: rhat nearly orthogonal to r -> restart
        tb = _tiny(rn2)
        breakdown = jnp.abs(rho_new) < 1e-12 * jnp.maximum(rn2, tb)
        restart = jnp.logical_or(fresh, breakdown)
        rhat = jax.lax.cond(restart, lambda _: r, lambda _: rhat, None)
        rho_new = jnp.where(restart, rn2, rho_new)
        beta = jnp.where(
            restart, 0.0,
            (rho_new / jnp.where(jnp.abs(rho) > tb, rho, tb))
            * (alpha / jnp.where(jnp.abs(omega) > tb, omega, tb)))
        p = jax.lax.cond(
            restart,
            lambda _: r,
            lambda _: _tmap(lambda ri, pi, vi: ri + beta * (pi - omega * vi),
                            r, p, v),
            None)
        phat = precond(p)
        v = matvec(phat)
        rv = tdot(rhat, v)
        alpha = rho_new / jnp.where(jnp.abs(rv) > tb, rv, tb)
        s_vec = taxpy(-alpha, v, r)
        shat = precond(s_vec)
        t = matvec(shat)
        tt = tdot(t, t)
        omega = tdot(t, s_vec) / jnp.where(tt > tb, tt, tb)
        x_new = _tmap(lambda xi, ph, sh: xi + alpha * ph + omega * sh,
                      x, phat, shat)
        r_new = taxpy(-omega, t, s_vec)
        rn_new = tnorm(r_new)
        finite = jnp.isfinite(rn_new)
        # reject non-finite trial states: fall back to best-so-far and
        # force a fresh restart next iteration
        x = jax.lax.cond(finite, lambda _: x_new, lambda _: bx, None)
        r = jax.lax.cond(
            finite, lambda _: r_new,
            lambda _: _tmap(lambda bi, ax: bi - ax, b, matvec(bx)), None)
        better = jnp.logical_and(finite, rn_new < brn)
        bx = jax.lax.cond(better, lambda _: x_new, lambda _: bx, None)
        brn = jnp.where(better, rn_new, brn)
        return (x, r, rhat, p, v, rho_new, alpha, omega, bx, brn, it + 1,
                jnp.logical_not(finite))

    out = jax.lax.while_loop(cond, body, state)
    x, bx, brn = out[0], out[8], out[9]
    rn = tnorm(out[1])
    use_best = jnp.logical_or(~jnp.isfinite(rn), brn < rn)
    x = jax.lax.cond(use_best, lambda _: bx, lambda _: x, None)
    rn = jnp.minimum(rn, brn)
    return x, SolveInfo(out[10], r0n, rn, rn <= tol)


# ---------------------------------------------------------------------------
# Fixed-step variants (lax.scan): REVERSE-DIFFERENTIABLE approximate solves
# ---------------------------------------------------------------------------
#
# Why these exist: the solver-level fixed-point adjoint differentiates the
# primal step map G(W) = W - C(W) R(W). At a converged primal (R ~ 0) ANY
# smooth approximate-solve operator C yields EXACT totals — the dC*R terms
# vanish — provided the vjp differentiates the map actually computed. A
# tolerance-based while_loop solver is not reverse-differentiable, and
# lax.custom_linear_solve substitutes the implicit-function transpose
# (an exact M^-T), which is only consistent if the forward solve is also
# (near-)exact — tight transpose solves cost ~1000 inner iterations per
# outer step-vjp. A FIXED number of scan steps is (a) smooth, (b) exactly
# differentiated by plain AD at ~2x forward cost, (c) a static trip count
# XLA unrolls/pipelines well on TPU. This is the TPU-native realization of
# the reference's runFPAdj philosophy (DATurbulenceModel.H:270-289): the
# adjoint's inner operator IS the primal's own smoother, transposed by AD.

def cg_steps(matvec: Callable, b, x0=None, precond: Callable | None = None,
             n_steps=20):
    """n_steps of preconditioned CG via lax.scan (no convergence exit).
    Guarded divisions keep the map smooth near breakdown."""
    precond = precond or _identity
    x = tzeros_like(b) if x0 is None else x0
    r = _tmap(lambda bi, ax: bi - ax, b, matvec(x))
    z = precond(r)
    rz = tdot(r, z)
    # STICKY freeze: once the residual reaches the dtype's stagnation
    # floor ((256 eps)^2 relative on rz — BiCGStab/CG in f32 stall around
    # 1e-5 rel), further steps would iterate on rounding noise, and the
    # noise recursion EXPLODES in the AD transpose (observed: momentum
    # bicgstab vjp -> NaN at n>=14 in f32). Frozen steps have alpha=0 so
    # they are exact identities (zero derivative contribution); the
    # freeze is carried in the scan state so post-stagnation noise can
    # never unfreeze it. The smoother does not need accuracy below the
    # floor: the fixed-point adjoint needs only a smooth, contractive
    # step map (see fvsolve.solve_fixed).
    eps = jnp.finfo(jnp.result_type(
        *jax.tree_util.tree_leaves(b))).eps
    # the floor is relative to the PROBLEM scale <b, M^-1 b>, not to the
    # initial residual: a warm-started solve at an already-converged
    # state begins AT the noise floor (rz0 << the solve's own scale), and
    # an r0-relative cutoff would then never trigger — the whole scan
    # iterates on noise and its transpose NaNs
    bz = jnp.abs(jax.lax.stop_gradient(tdot(b, precond(b))))
    cutoff = (256.0 * eps) ** 2 * jnp.maximum(
        bz, jnp.abs(jax.lax.stop_gradient(rz)))

    def step(c, _):
        x, r, z, p, rz, live = c
        arz = jnp.abs(jax.lax.stop_gradient(rz))
        live = jnp.logical_and(live, jnp.isfinite(arz))
        live = jnp.logical_and(live, arz > cutoff)
        ap = matvec(p)
        pap = tdot(p, ap)
        tp = _tiny(pap)
        alpha = jnp.where(live, rz / jnp.where(jnp.abs(pap) > tp, pap, tp),
                          0.0)
        x = taxpy(alpha, p, x)
        r = taxpy(-alpha, ap, r)
        z = precond(r)
        rz_new = tdot(r, z)
        beta = jnp.where(live,
                         rz_new / jnp.where(jnp.abs(rz) > tp, rz, tp), 0.0)
        p = taxpy(beta, p, z)
        return (x, r, z, p, rz_new, live), None

    (x, r, *_), _ = jax.lax.scan(
        step, (x, r, z, z, rz, jnp.asarray(True)), None,
        length=int(n_steps))
    return x


def bicgstab_steps(matvec: Callable, b, x0=None,
                   precond: Callable | None = None, n_steps=10):
    """n_steps of preconditioned BiCGStab via lax.scan (no restarts, no
    convergence exit; guarded divisions)."""
    precond = precond or _identity
    x = tzeros_like(b) if x0 is None else x0
    r = _tmap(lambda bi, ax: bi - ax, b, matvec(x))
    rhat = r
    one = jnp.asarray(1.0, jnp.result_type(*jax.tree_util.tree_leaves(b)))
    zero_t = tzeros_like(b)
    # sticky freeze at the dtype stagnation floor (see cg_steps) — in f32
    # BiCGStab stalls near 1e-5 rel and the post-stagnation recursion
    # NaNs in the AD transpose
    eps = jnp.finfo(one.dtype).eps
    rr0 = jax.lax.stop_gradient(tdot(r, r))
    # problem-scale floor (see cg_steps: warm starts begin at the floor)
    bb = jax.lax.stop_gradient(tdot(b, b))
    cutoff = (256.0 * eps) ** 2 * jnp.maximum(bb, rr0)

    def step(c, _):
        x, r, p, v, rho, alpha, omega, live = c
        rr = jax.lax.stop_gradient(tdot(r, r))
        live = jnp.logical_and(live, jnp.isfinite(rr))
        live = jnp.logical_and(live, rr > cutoff)
        rho_new = tdot(rhat, r)
        tb = _tiny(rho_new)
        beta = ((rho_new / jnp.where(jnp.abs(rho) > tb, rho, tb))
                * (alpha / jnp.where(jnp.abs(omega) > tb, omega, tb)))
        p = _tmap(lambda ri, pi, vi: ri + beta * (pi - omega * vi), r, p, v)
        phat = precond(p)
        v = matvec(phat)
        rv = tdot(rhat, v)
        alpha_n = rho_new / jnp.where(jnp.abs(rv) > tb, rv, tb)
        s_vec = taxpy(-alpha_n, v, r)
        shat = precond(s_vec)
        t = matvec(shat)
        tt = tdot(t, t)
        omega_n = tdot(t, s_vec) / jnp.where(tt > tb, tt, tb)
        alpha_n = jnp.where(live, alpha_n, 0.0)
        omega_n = jnp.where(live, omega_n, 0.0)
        x = _tmap(lambda xi, ph, sh: xi + alpha_n * ph + omega_n * sh,
                  x, phat, shat)
        r_new = taxpy(-omega_n, t, s_vec)
        # keep the pre-step residual when frozen: s_vec = r - alpha*v with
        # alpha=0 still recomputes r through t/omega noise paths otherwise
        r = jax.lax.cond(live, lambda _: r_new, lambda _: r, None)
        return (x, r, p, v, rho_new, alpha_n, omega_n, live), None

    (x, *_), _ = jax.lax.scan(
        step, (x, r, zero_t, zero_t, one, one, one, jnp.asarray(True)),
        None, length=int(n_steps))
    return x


def jacobi_steps(matvec: Callable, dinv, r0, n_steps=10, omega=0.6666667):
    """delta = k steps of damped Jacobi on A delta = r0, delta0 = 0.

    LINEAR in r0 with coefficients independent of the data — the smoother
    the fixed-point step map uses for nonsymmetric equations. Unlike
    Krylov steps, there are no <r,z>/<p,Ap> coefficient ratios that turn
    into differentiated noise at a converged (r0 ~ eps) state; AD through
    the scan is the exact transpose and is unconditionally stable.
    No dot products either: on a sharded mesh each step is halo-local
    (TPU/ICI-friendly; reference role: the smoothSolver sweeps)."""
    omega = jnp.asarray(omega, jnp.result_type(
        *jax.tree_util.tree_leaves(r0)))

    def step(c, _):
        delta, r = c
        upd = _tmap(lambda di, ri: omega * di * ri, dinv, r)
        delta = _tmap(jnp.add, delta, upd)
        r = _tmap(lambda ri, ai: ri - ai, r, matvec(upd))
        return (delta, r), None

    (delta, _), _ = jax.lax.scan(step, (tzeros_like(r0), r0), None,
                                 length=int(n_steps))
    return delta


def chebyshev_steps(matvec: Callable, dinv, r0, n_steps=20,
                    lam_max=2.2, ratio=30.0):
    """delta = k-step Chebyshev semi-iteration on D^-1 A delta = D^-1 r0,
    delta0 = 0, targeting the spectrum slice [lam_max/ratio, lam_max] of
    the Jacobi-preconditioned operator (hypre/AMG smoother recipe; for a
    weakly diagonally dominant SPD/SND fvMatrix, Gershgorin gives
    lam(D^-1 A) <= 2, so the static 2.2 bound is safe — STATIC bounds keep
    the map linear in r0, which is the whole point, see jacobi_steps).
    Dot-product-free and exactly AD-transposable."""
    dt = jnp.result_type(*jax.tree_util.tree_leaves(r0))
    hi = jnp.asarray(lam_max, dt)
    lo = hi / ratio
    theta = (hi + lo) / 2.0
    half = (hi - lo) / 2.0
    sigma = theta / half

    pr0 = _tmap(lambda di, ri: di * ri, dinv, r0)

    def pmv(v):
        return _tmap(lambda di, ai: di * ai, dinv, matvec(v))

    d0 = tscale(1.0 / theta, pr0)
    rho0 = 1.0 / sigma

    def step(c, _):
        delta, r, dvec, rho = c
        delta = _tmap(jnp.add, delta, dvec)
        r = _tmap(lambda ri, ai: ri - ai, r, pmv(dvec))
        rho_new = 1.0 / (2.0 * sigma - rho)
        dvec = _tmap(lambda dv, ri: rho_new * rho * dv
                     + (2.0 * rho_new / half) * ri, dvec, r)
        return (delta, r, dvec, rho_new), None

    (delta, r, dvec, _), _ = jax.lax.scan(
        step, (tzeros_like(r0), pr0, d0, jnp.asarray(rho0, dt)), None,
        length=int(n_steps))
    return delta


# ---------------------------------------------------------------------------
# Restarted GMRES (the adjoint linear solver)
# ---------------------------------------------------------------------------

def gmres(matvec: Callable, b, x0=None, precond: Callable | None = None,
          restart=60, rel_tol=1e-6, abs_tol=1e-14, max_iters=1000,
          deflate=0, aug0=None, return_aug=False):
    """Flexible right-preconditioned restarted GMRES (FGMRES) on a pytree.

    Matches the role of the reference's KSPGMRES setup
    (DALinearEqn.C:28 createMLRKSP: relTol/absTol/restart/maxIters from
    `adjEqnOption`, right PC side). FLEXIBLE variant: the preconditioned
    basis Z is stored alongside V, so the preconditioner may itself be an
    inner Krylov solve (our segregated block PC) — a fixed-operator
    assumption here silently corrupts the solution. The Krylov basis is a
    stacked flat matrix for MXU-friendly orthogonalization. Without a
    preconditioner (and without deflation) Z is not materialized — at
    bench scale the basis is the memory budget.

    deflate=k > 0 enables DEFLATED RESTARTS (GMRES-E/GCRO-DR class,
    Morgan 2002): restarted GMRES discards its Krylov space every cycle,
    so a handful of near-null directions of A (eigenvalues of a
    fixed-point step map near 1) re-enter the residual each restart and
    the iteration stalls — exactly the observed 512x512 fixed-point
    adjoint plateau (VERDICT r3, BENCH_r03). With deflation, the last k
    of each cycle's m directions are not fresh Krylov vectors but the
    previous cycle's best approximations to A's smallest directions,
    extracted per cycle from the small projected problem
    min_y ||Hbar y|| / ||Z y|| (SVD-quality harmonic-Ritz analogue that
    needs only eigh of m x m matrices — TPU-compilable, unlike
    nonsymmetric eig). The subspace recycles across restarts, so the
    stall-causing directions stay deflated.
    """
    flexible = precond is not None
    k_defl = int(deflate)
    store_z = flexible or k_defl > 0
    precond = precond or _identity
    flat_b, unravel = jax.flatten_util.ravel_pytree(b)
    n = flat_b.shape[0]
    dtype = flat_b.dtype

    def mvA_flat(u):
        return jax.flatten_util.ravel_pytree(matvec(unravel(u)))[0]

    def mprec_flat(u):
        return jax.flatten_util.ravel_pytree(precond(unravel(u)))[0]

    x = jnp.zeros_like(flat_b) if x0 is None else \
        jax.flatten_util.ravel_pytree(x0)[0]

    bnorm = jnp.linalg.norm(flat_b)
    tol = jnp.maximum(rel_tol * bnorm, abs_tol)
    m = restart
    m_arn = m - k_defl     # fresh Arnoldi directions per cycle
    assert m_arn >= 1, "deflate must be < restart"

    def arnoldi_cycle(x, U):
        r = flat_b - mvA_flat(x)    # TRUE residual (x lives in solution space)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype=dtype)
        Z = jnp.zeros((m if store_z else 1, n), dtype=dtype)
        H = jnp.zeros((m + 1, m), dtype=dtype)
        cs = jnp.zeros((m,), dtype=dtype)
        sn = jnp.zeros((m,), dtype=dtype)
        g = jnp.zeros((m + 1,), dtype=dtype).at[0].set(beta)
        V = V.at[0].set(r / jnp.maximum(beta, _tiny(beta)))

        def body(j, carry):
            done = carry[-1]
            return jax.lax.cond(done, lambda c: c, lambda c: _step(j, c),
                                carry)

        def _step(j, carry):
            V, Z, H, cs, sn, g, k, done = carry
            if k_defl > 0:
                # augmented columns: recycle directions from U (zero rows
                # of a not-yet-seeded U fall back to the Krylov vector).
                # U rows are SOLUTION-space directions (extracted from the
                # previous cycle's Z span), so they enter the augmented
                # basis verbatim — re-preconditioning them (z = M(u))
                # would drift the recycle space away from the extracted
                # near-null directions of A each cycle (GCRO-DR).
                u = U[jnp.maximum(j - m_arn, 0)]
                unorm = jnp.linalg.norm(u)
                use_u = jnp.logical_and(j >= m_arn, unorm > _tiny(unorm))
                if flexible:
                    z = jnp.where(use_u, u, mprec_flat(V[j]))
                else:
                    z = jnp.where(use_u, u, V[j])
            else:
                z = mprec_flat(V[j]) if flexible else V[j]
            if store_z:
                Z = Z.at[j].set(z)
            w = mvA_flat(z)
            # modified Gram-Schmidt (two-pass for stability): MXU matvec
            h = V @ w                      # (m+1,) only first j+1 meaningful
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h = h * mask
            w = w - V.T @ h
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            h = h + h2
            hj1 = jnp.linalg.norm(w)
            H = H.at[:, j].set(h)
            H = H.at[j + 1, j].set(hj1)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, _tiny(hj1)))

            # apply accumulated Givens rotations to column j
            def rot(i, col):
                t0 = cs[i] * col[i] + sn[i] * col[i + 1]
                t1 = -sn[i] * col[i] + cs[i] * col[i + 1]
                return col.at[i].set(t0).at[i + 1].set(t1)
            col = jax.lax.fori_loop(0, j, rot, H[:, j])
            denom = jnp.sqrt(col[j] ** 2 + hj1 ** 2)
            c_new = col[j] / jnp.maximum(denom, _tiny(denom))
            s_new = hj1 / jnp.maximum(denom, _tiny(denom))
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            col = col.at[j].set(denom).at[j + 1].set(0.0)
            H = H.at[:, j].set(col)
            g = g.at[j + 1].set(-s_new * g[j]).at[j].set(c_new * g[j])
            done = jnp.abs(g[j + 1]) <= tol
            return V, Z, H, cs, sn, g, k + 1, done

        V, Z, H, cs, sn, g, k, done = jax.lax.fori_loop(
            0, m, body,
            (V, Z, H, cs, sn, g, jnp.asarray(0), jnp.asarray(False)))

        # back-substitute y from the leading k x k system H[:k,:k] y = g[:k]
        # (columns >= k were never built: give them unit diagonal, zero rhs,
        # so their y components are exactly zero)
        used = jnp.arange(m) < k
        Hm = jnp.where(used[None, :] & used[:, None], H[:m, :m],
                       jnp.eye(m, dtype=dtype))
        y = jax.scipy.linalg.solve_triangular(
            Hm, jnp.where(used, g[:m], 0.0), lower=False)
        S = Z if store_z else V[:m]
        x = x + S.T @ y
        resid = jnp.abs(g[k])

        if k_defl > 0:
            # refresh the recycle space: the k_defl directions s = S^T y
            # minimizing ||A s|| / ||s|| over the cycle's search space,
            # from the generalized problem (Hbar^T Hbar) y = theta (S S^T) y
            # (A S = V Hbar exactly, V orthonormal). All m x m — one eigh +
            # one Cholesky; the only O(n) work is S S^T and the k_defl
            # basis combinations.
            Hbar = jnp.where(used[None, :], H, 0.0)    # (m+1, m)
            A_small = Hbar.T @ Hbar
            G = S @ S.T                                # (m, m) Gram
            # pad unused columns to identity so they sort to theta = 1
            eye = jnp.eye(m, dtype=dtype)
            A_small = jnp.where(used[None, :] & used[:, None], A_small, eye)
            G = jnp.where(used[None, :] & used[:, None], G, eye)
            # guard: G must be SPD; ridge scaled to the dtype and the
            # Gram magnitude (a fixed 1e-12 is below f32 epsilon — the
            # TPU bench dtype — so near-dependent basis columns could
            # still NaN the cholesky exactly on the ill-conditioned
            # cases deflation targets)
            ridge = (jnp.sqrt(jnp.finfo(dtype).eps)
                     * jnp.trace(G) / jnp.asarray(m, dtype))
            G = G + jnp.maximum(ridge, jnp.asarray(1e-30, dtype)) * eye
            L = jnp.linalg.cholesky(G)
            Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            Aw = Li @ A_small @ Li.T
            theta, Q = jnp.linalg.eigh(Aw)             # ascending
            Y = Li.T @ Q[:, :k_defl]                   # smallest k_defl
            U_new = Y.T @ S                            # (k_defl, n)
            # normalize rows (scale-free directions)
            nrm = jnp.linalg.norm(U_new, axis=1, keepdims=True)
            U_new = U_new / jnp.maximum(nrm, _tiny(beta))
            # keep the old space if the cycle died before building one
            U = jnp.where(k >= 1, U_new, U)
        return x, U, resid, done, k

    def cond(s):
        x, U, res, it, done = s
        return jnp.logical_and(it < max_iters, jnp.logical_not(done))

    def body(s):
        x, U, res, it, done = s
        x, U, res, done, k = arnoldi_cycle(x, U)
        return x, U, res, it + k, res <= tol

    # aug0: recycle space carried in from a PREVIOUS gmres call (host-
    # restarted chunked solves — e.g. bench fp-adjoint cycles): without
    # it, every host-level restart re-derives the near-null directions
    # from scratch and the deflation benefit resets per chunk.
    U0 = (jnp.zeros((max(k_defl, 1), n), dtype=dtype) if aug0 is None
          else jnp.asarray(aug0, dtype=dtype).reshape(max(k_defl, 1), n))
    if aug0 is not None and k_defl > 0:
        # re-orthonormalize the carried-in recycle space (ADVICE r4):
        # rows harvested from successive chunks can grow near-parallel
        # (each harvest re-extracts the same dominant near-null
        # directions), and a degenerate augmented basis collapses the
        # effective search space — the recycle locks onto its own span
        # and the outer iteration stalls. One 16x16 Gram + Cholesky
        # whitening keeps the span but restores full rank; rows that are
        # numerically dependent (tiny Cholesky pivots) are zeroed, which
        # the in-cycle unorm guard then treats as unseeded.
        Gu = U0 @ U0.T
        ridge0 = jnp.sqrt(jnp.finfo(dtype).eps) * (
            jnp.trace(Gu) / jnp.asarray(max(k_defl, 1), dtype) + 1e-30)
        Lu = jnp.linalg.cholesky(Gu + ridge0 *
                                 jnp.eye(max(k_defl, 1), dtype=dtype))
        Uw = jax.scipy.linalg.solve_triangular(
            Lu, U0, lower=True)
        U0 = jnp.where(jnp.isfinite(Uw), Uw, 0.0)
        rn = jnp.linalg.norm(U0, axis=1, keepdims=True)
        U0 = jnp.where(rn > _tiny(rn), U0 / jnp.maximum(rn, _tiny(rn)), 0.0)
    r0 = jnp.linalg.norm(flat_b - mvA_flat(x))
    x, U, res, it, done = jax.lax.while_loop(
        cond, body, (x, U0, r0, jnp.asarray(0), r0 <= tol))

    if return_aug:
        return unravel(x), SolveInfo(it, r0, res, res <= tol), U
    return unravel(x), SolveInfo(it, r0, res, res <= tol)
