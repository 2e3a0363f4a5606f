"""Batched tridiagonal solves via parallel cyclic reduction (PCR).

TPU-native line-implicit building block. The reference preconditions its
adjoint KSP with ILU(1)+ASM on an assembled approximate Jacobian
(pyDAFoam.py:526-548, DALinearEqn.C:28); the TPU equivalent of that
"strong local solve" is an EXACT solve along mesh lines (the banded
directions of the DIA layout), which vectorizes perfectly: PCR is
ceil(log2(n)) rounds of full-width shifts + elementwise FMAs — no
sequential Thomas recursion, no gathers, no host sync.

Stability: PCR is unconditionally stable for diagonally dominant systems;
FV operators (after relax()) are (weakly) diagonally dominant, and the
division guards below make degenerate rows (zero lines from the padded
dense-DIA layout) behave as identity rows.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from dafoam_tpu.utils.precision import guard_tiny
from jax import lax


def _shift0(x, o, fill=0.0):
    """Shift along axis 0 by o with constant fill: out[i] = x[i+o]."""
    n = x.shape[0]
    if o == 0:
        return x
    pad = [(max(0, -o), max(0, o))] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad, constant_values=fill)
    return lax.slice_in_dim(xp, max(0, -o) + o, max(0, -o) + o + n, axis=0)


def _bcast(coef, like):
    """Broadcast a (n, batch...) coefficient against a RHS with extra
    trailing dims (e.g. momentum (n, b, 3))."""
    while coef.ndim < like.ndim:
        coef = coef[..., None]
    return coef


def pcr_solve(a, b, c, d):
    """Solve the tridiagonal system along axis 0:

        a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i]

    with a[0] == 0 and c[n-1] == 0 (rows where both couplings are zero are
    independent — PCR therefore solves a block-diagonal family of lines in
    one pass, which is how stride-s "line solves" on a flattened mesh
    decouple at line ends).

    a, b, c: (n, *batch); d: (n, *batch) or (n, *batch, k) with extra
    trailing dims broadcast. b may carry MORE trailing dims than a/c (a
    per-component diagonal with shared bands, the momentum-matrix form);
    a/c are lifted to b's rank. Returns x shaped like d.
    """
    # rank-normalize the coefficients (trailing-dim broadcast semantics)
    nd = max(a.ndim, b.ndim, c.ndim)
    while a.ndim < nd:
        a = a[..., None]
    while b.ndim < nd:
        b = b[..., None]
    while c.ndim < nd:
        c = c[..., None]
    n = a.shape[0]
    if n == 1:
        bb = _bcast(b, d)
        return d / jnp.where(jnp.abs(bb) > 0, bb, 1.0)
    steps = max(1, math.ceil(math.log2(n)))
    tiny = guard_tiny(b.dtype)

    def safe_div(x, y):
        return x / jnp.where(jnp.abs(y) > tiny, y, 1.0)

    for k in range(steps):
        s = 1 << k
        # out-of-range rows act as identity rows: b=1, a=c=d=0
        b_m, b_p = _shift0(b, -s, 1.0), _shift0(b, s, 1.0)
        a_m, c_p = _shift0(a, -s), _shift0(c, s)
        c_m, a_p = _shift0(c, -s), _shift0(a, s)
        d_m, d_p = _shift0(d, -s), _shift0(d, s)
        alpha = -safe_div(a, b_m)
        beta = -safe_div(c, b_p)
        a = alpha * a_m
        c = beta * c_p
        b = b + alpha * c_m + beta * a_p
        d = d + _bcast(alpha, d_m) * d_m + _bcast(beta, d_p) * d_p
    bb = _bcast(b, d)
    return d / jnp.where(jnp.abs(bb) > tiny, bb, 1.0)


def pcr_solve_periodic(a, b, c, d):
    """Cyclic tridiagonal solve along axis 0: additionally couples row 0 to
    row n-1 with a[0] (coef of x[n-1] in row 0) and c[n-1] (coef of x[0]
    in row n-1). Sherman–Morrison on top of two PCR solves.

    Lines that are NOT cyclic (a[0] == c[-1] == 0 for that batch column)
    reduce exactly to pcr_solve: the correction term vanishes.
    """
    nd = max(a.ndim, b.ndim, c.ndim)
    while a.ndim < nd:
        a = a[..., None]
    while b.ndim < nd:
        b = b[..., None]
    while c.ndim < nd:
        c = c[..., None]
    n = a.shape[0]
    if n == 1:
        bb = _bcast(b, d)
        return d / jnp.where(jnp.abs(bb) > 0, bb, 1.0)
    tiny = guard_tiny(b.dtype)
    alpha = a[0]          # corner (0, n-1)
    beta = c[-1]          # corner (n-1, 0)
    # gamma: any nonzero scale; use -b[0] (guarded) for conditioning
    gamma = jnp.where(jnp.abs(b[0]) > tiny, -b[0], -1.0)
    b_mod = b.at[0].add(-gamma).at[-1].add(-beta * alpha / gamma)
    a_in = a.at[0].set(0.0)
    c_in = c.at[-1].set(0.0)
    # u vector: gamma at row 0, beta at row n-1
    u = jnp.zeros_like(b).at[0].set(gamma).at[-1].set(beta)
    # solve B y = d and B q = u together by stacking along a new trailing axis
    y = pcr_solve(a_in, b_mod, c_in, d)
    q = pcr_solve(a_in, b_mod, c_in, u)
    # v^T x = x[0] + (alpha/gamma) x[n-1]
    ag = alpha / gamma
    vy = y[0] + _bcast(ag, y[-1]) * y[-1]
    vq = q[0] + ag * q[-1]
    denom = _bcast(jnp.asarray(1.0 + vq), vy)
    fac = vy / jnp.where(jnp.abs(denom) > tiny, denom, 1.0)
    qb = q if q.ndim == y.ndim else q[..., None]
    return y - qb * fac
