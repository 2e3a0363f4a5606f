"""Backend-aware numeric floors.

XLA:TPU emulates float64 as a DOUBLE-FLOAT (a high/low pair of f32s):
full ~1e-15 *precision* but only f32's *exponent range* (~1.2e-38 min
normal, ~3.4e38 max — measured in scripts/tpu_f64_range_probe.py: 1e-300
flushes to 0, 1e-30*1e-30 -> 0, finfo(f64).tiny -> 0, 1e200*1e100 -> inf).
Consequence: every ``jnp.finfo(float64).tiny``-style denominator guard is
a no-op on the chip — sub-1e-38 denominators sail through and the
residual vjp NaNs where CPU f64 is fine (round-2 VERDICT item 2).

``guard_tiny(dtype)`` is the floor that actually survives the active
backend: finfo.tiny off-TPU, ~1e-36 for f64-on-TPU (headroom above the
f32 normal floor so double-float hi/lo splitting stays normal, while
1/guard ~ 1e36 stays below f32 max). Decided at TRACE time from
``jax.default_backend()`` — traces are backend-specific, so this is
sound under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _range_limited() -> bool:
    """True when 64-bit floats run with f32 exponent range (TPU)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def guard_tiny(dtype) -> float:
    """Smallest safe denominator-guard magnitude for `dtype` on the
    ACTIVE backend (see module docstring). Use instead of finfo.tiny in
    `jnp.where(|d| > tiny, d, 1)` / `jnp.maximum(x, tiny)` guards."""
    fi = jnp.finfo(dtype)
    if fi.bits >= 64 and _range_limited():
        return 1e-36
    return float(fi.tiny)


def sq_guard(dtype) -> float:
    """Floor whose SQUARE still survives the active backend — for guards
    feeding quotient-rule jvps that divide by denom^2 (e.g. the snGrad
    limiter). f32 and TPU-f64 both have ~1.2e-38 range, so 1e-18 keeps
    denom^2 normal; true f64 can afford 1e-30 (round-2 commit 452a932
    picked these for f32/f64; TPU-f64 must use the f32-range value)."""
    fi = jnp.finfo(dtype)
    if fi.bits >= 64 and not _range_limited():
        return 1e-30
    return 1e-18


def guard_huge(dtype) -> float:
    """Largest safe magnitude clamp for `dtype` on the active backend."""
    fi = jnp.finfo(dtype)
    if fi.bits >= 64 and _range_limited():
        return 1e36
    return float(fi.max)
