"""Pallas TPU kernels for the HBM-bound hot ops.

The banded (DIA) LDU matvec is the Krylov inner loop (fvmatrix.matvec_fn;
reference role: Foam::lduMatrix::Amul inside the PETSc/LDU solvers).  The
XLA lowering of `d*x + sum_k coef_k * shift(x, o_k)` re-reads the shifted
x slices from HBM per band — measured 134-250 us (38-70 GB/s effective)
at 262k cells on v5e, ~12x off the ~820 GB/s roofline.  This kernel keeps
the whole padded x vector VMEM-resident and applies every band as a
static in-VMEM slice, reading each operand from HBM exactly once.

Scope: 1-D scalar matvec, the whole problem VMEM-resident (x + K bands +
diag + y <= ~12 MB, i.e. up to ~700k cells at K=3 in f32).  Larger
problems fall back to the XLA path in fvmatrix.matvec_fn; no AD rules are
attached (Krylov matvecs and preconditioners are not differentiated —
adjoints go through the residual vjp, totals through the IFT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic; keep imports lazy-safe on exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# VMEM budget guard: padded x + K coef rows + diag + y, f32 words
_VMEM_WORDS = 3_000_000


def dia_matvec_supported(n, n_offsets, dtype) -> bool:
    if not HAVE_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    return n * (n_offsets + 3) <= _VMEM_WORDS


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_matvec(diag, coef, offsets: tuple, x, interpret: bool = False):
    """y = diag*x + sum_k coef[k] * shift(x, offsets[k]).

    shift semantics match fvmatrix.matvec_fn: y[i] += coef[k][i] *
    x[i + offsets[k]] (zero outside range).  All operands f32, 1-D.
    `interpret=True` runs the Pallas interpreter (CPU test path).
    """
    n = x.shape[0]
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    xp = jnp.pad(x, (lo, hi))

    def kernel(xp_ref, d_ref, c_ref, y_ref):
        xv = xp_ref[:]
        y = d_ref[:] * jax.lax.slice_in_dim(xv, lo, lo + n)
        for k, o in enumerate(offsets):
            y = y + c_ref[k] * jax.lax.slice_in_dim(xv, lo + o, lo + o + n)
        y_ref[:] = y

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, diag, coef)


def dia_matvec_reference(diag, coef, offsets: tuple, x):
    """XLA reference implementation (same semantics), for parity tests."""
    n = x.shape[0]
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    xp = jnp.pad(x, (lo, hi))
    y = diag * x
    for k, o in enumerate(offsets):
        y = y + coef[k] * jax.lax.slice_in_dim(xp, lo + o, lo + o + n)
    return y


def transpose_coef(coef, offsets: tuple):
    """Band layout of A^T given A's: y = D x + sum_k C_k * shift(x, o_k)
    has (A^T ct)_j = d_j ct_j + sum_k C_k[j - o_k] ct_{j - o_k}, i.e. the
    SAME dia form with offsets -o_k and rows C'_k = shift(C_k, -o_k)
    (zero-filled). Static slices only; used by the custom-vjp backward."""
    n = coef.shape[1]
    rows = []
    for k, o in enumerate(offsets):
        row = coef[k]
        if o > 0:        # shift right by o: C'[j] = C[j-o]
            row = jnp.pad(row[: n - o], (o, 0))
        elif o < 0:      # shift left by |o|
            row = jnp.pad(row[-o:], (0, -o))
        rows.append(row)
    return jnp.stack(rows)


@functools.lru_cache(maxsize=None)
def _dia_ad_factory(offsets: tuple, interpret: bool):
    @jax.custom_vjp
    def f(diag, coef, x):
        return dia_matvec(diag, coef, offsets, x, interpret=interpret)

    def fwd(diag, coef, x):
        return f(diag, coef, x), (diag, coef, x)

    def bwd(res, ct):
        diag, coef, x = res
        n = x.shape[0]
        lo = max(0, -min(offsets)) if offsets else 0
        hi = max(0, max(offsets)) if offsets else 0
        offs_t = tuple(-o for o in offsets)
        x_bar = dia_matvec(diag, transpose_coef(coef, offsets), offs_t, ct,
                           interpret=interpret)
        diag_bar = ct * x
        xp = jnp.pad(x, (lo, hi))
        coef_bar = jnp.stack(
            [ct * jax.lax.slice_in_dim(xp, lo + o, lo + o + n)
             for o in offsets]) if offsets else jnp.zeros_like(coef)
        return diag_bar, coef_bar, x_bar

    f.defvjp(fwd, bwd)
    return f


def dia_matvec_ad(diag, coef, offsets: tuple, x, interpret: bool = False):
    """Reverse-differentiable Pallas DIA matvec.

    The raw pallas_call has no AD rules, so anything that reverse-
    differentiates THROUGH a Krylov/smoother loop on TPU (the fixed-point
    adjoint's step map, unsteady reverse scans) would die in jax's
    transpose machinery. This wrapper supplies the exact reverse rule
    using the same kernel family:
        x_bar    = A^T ct          (dia_matvec with transposed band layout)
        diag_bar = ct * x
        coef_bar[k] = ct * shift(x, o_k)   (static slices)
    Forward-mode jvp is NOT supported through this op (custom_vjp
    limitation); operators that get jvp'd or LINEAR-TRANSPOSED by jax
    (lax.custom_linear_solve does so eagerly) must use the XLA banded
    closure instead (fvmatrix.matvec_fn(pallas=False)).
    """
    return _dia_ad_factory(tuple(int(o) for o in offsets),
                           bool(interpret))(diag, coef, x)
