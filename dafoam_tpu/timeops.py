"""Temporal reduction of function values for unsteady runs.

Re-designs the reference's DATimeOp family (src/adjoint/DATimeOp/, 3
children; DATimeOp.H:80-86 compute/dFScaling): given the per-step history
of a function value (a (T,) array produced inside lax.scan), reduce to one
scalar. `dFScaling` — the per-step weight the reference uses to seed the
reverse time sweep (mphys_dafoam.py:1565-1585) — is just the gradient of
these pure reductions, so jax.vjp derives it automatically.
"""

from __future__ import annotations

import jax.numpy as jnp


def time_op(values: jnp.ndarray, mode: str = "final", cfg: dict | None = None):
    """values: (T,) per-time-step function values -> scalar.

    mode: final | average | max  (reference registered types).
    cfg["timeOpFracStart"]: averaging window start fraction (reference
    `average` uses the last N-fraction of steps);
    cfg["timeOpMaxMode"]="KS" + cfg["coeffKS"]: soft max (differentiable).
    """
    cfg = cfg or {}
    T = values.shape[0]
    if mode == "final":
        return values[-1]
    if mode == "average":
        frac = cfg.get("timeOpFracStart", 0.5)
        n0 = int(round(frac * (T - 1)))
        w = jnp.arange(T) >= n0
        return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1)
    if mode == "max":
        if cfg.get("timeOpMaxMode", "KS") == "KS":
            rho = cfg.get("coeffKS", 20.0)
            m = jnp.max(values)
            return m + jnp.log(jnp.sum(jnp.exp(rho * (values - m)))) / rho
        return jnp.max(values)
    raise NotImplementedError(f"timeOp {mode!r}")
