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
