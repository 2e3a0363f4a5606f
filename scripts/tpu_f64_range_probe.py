"""Probe the EXPONENT RANGE of f64-on-TPU (jax_enable_x64 under the axon
plugin).

Hypothesis for the round-2 f64 adjoint NaN (VERDICT item 2): XLA emulates
f64 on TPU as a double-float (two f32s) — full ~1e-15 precision but only
f32's ~1e+-38 exponent range. Every `jnp.finfo(float64).tiny` (2.2e-308)
guard then flushes to zero on the chip, so `x / jnp.where(|d| > tiny, d,
1)`-style protections pass sub-1e-38 denominators straight through and
the residual vjp NaNs/infs where the CPU is fine.
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def chk(name, fn):
    try:
        v = jax.jit(fn)()
        print(f"{name}: {float(v):.6e}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    print("x64:", jnp.asarray(1.0).dtype, flush=True)
    # precision: double-float keeps ~30 significant digits of sum structure
    chk("1 + 1e-14 - 1 (f64 precision)",
        lambda: (jnp.float64(1.0) + 1e-14) - 1.0)
    # range: true f64 keeps these; double-float flushes/infs them
    chk("1e-300 (deep subnormal range)", lambda: jnp.float64(1e-300) * 1.0)
    chk("1e-45 (below f32 tiny)", lambda: jnp.float64(1e-45) * 1.0)
    chk("1e-30 * 1e-30", lambda: jnp.float64(1e-30) * jnp.float64(1e-30))
    chk("1e300 (above f32 max)", lambda: jnp.float64(1e200) * jnp.float64(1e100))
    chk("finfo.tiny survives", lambda: jnp.float64(jnp.finfo(jnp.float64).tiny)
        * jnp.float64(1e10))
    chk("1/1e-310 (guarded-div blowup)",
        lambda: jnp.float64(1.0) / (jnp.float64(1e-310) + jnp.float64(
            jnp.finfo(jnp.float64).tiny)))
    chk("sqrt(1e-60)", lambda: jnp.sqrt(jnp.float64(1e-60)))


if __name__ == "__main__":
    main()
