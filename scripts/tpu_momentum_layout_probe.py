"""Measure the TPU cost of the momentum (nc,3) layout in Krylov loops.

XLA:TPU lays out the minor-most dim in lanes; a (nc,3) array uses 3 of
128 lanes, so every elementwise op / band-shift / dot in the momentum
BiCGStab loop may run up to ~42x below VPU peak and read lane-padded HBM
tiles (round-2 observed 57x padding on traced (.,3) coefficient arrays).
This times N banded matvecs + axpys in three layouts at bench scale:

  a) (nc,3)    — current momentum layout
  b) (3,nc)    — transposed (component-major, full lanes)
  c) (nc,) x3  — scalar loop per component (upper bound of layout a)

If (b) wins big, fvsolve.solve should run vector equations transposed
inside the Krylov loop (transpose cost amortized over all iterations).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    n = int(os.environ.get("PROBE_N", str(512 * 512)))
    iters = int(os.environ.get("PROBE_ITERS", "200"))
    offsets = (-513, -512, -1, 1, 512, 513)
    lo, hi = 513, 513
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    diag = jax.random.normal(k1, (n,), jnp.float32) + 8.0
    coef = 0.1 * jax.random.normal(k2, (len(offsets), n), jnp.float32)
    x3 = jax.random.normal(k3, (n, 3), jnp.float32)

    def mv_rows(x):  # (nc,3): slices along axis 0, coef broadcast on lanes
        y = diag[:, None] * x
        xp = jnp.pad(x, ((lo, hi), (0, 0)))
        for i, o in enumerate(offsets):
            y = y + coef[i][:, None] * jax.lax.slice_in_dim(
                xp, lo + o, lo + o + n, axis=0)
        return y

    def mv_t(x):  # (3,nc): slices along axis 1 (lanes), full-lane tiles
        y = diag[None, :] * x
        xp = jnp.pad(x, ((0, 0), (lo, hi)))
        for i, o in enumerate(offsets):
            y = y + coef[i][None, :] * jax.lax.slice_in_dim(
                xp, lo + o, lo + o + n, axis=1)
        return y

    def mv_s(x):  # (nc,) scalar
        y = diag * x
        xp = jnp.pad(x, (lo, hi))
        for i, o in enumerate(offsets):
            y = y + coef[i] * jax.lax.slice_in_dim(xp, lo + o, lo + o + n)
        return y

    def loop(mv, x0, nit):
        # matvec + dot + axpy per step: the BiCGStab inner skeleton
        def body(c, _):
            x, r = c
            ax = mv(x)
            alpha = jnp.vdot(r, ax) / (jnp.vdot(ax, ax) + 1e-30)
            r2 = r - alpha * ax
            return (x + 1e-6 * r2, r2), ()
        (xf, rf), _ = jax.lax.scan(body, (x0, x0), None, length=nit)
        return xf

    results = {"platform": jax.devices()[0].platform, "n": n,
               "iters": iters, "bands": len(offsets)}

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[name] = round(dt, 4)
        return dt

    timed("rows_nc3_s", lambda x: loop(mv_rows, x, iters), x3)
    timed("t_3nc_s", lambda x: loop(mv_t, x, iters), x3.T.copy())
    timed("scalar3_s",
          lambda x: jnp.stack([loop(mv_s, x[:, c], iters) for c in range(3)],
                              axis=1), x3)
    # include entry/exit transpose amortization for the (3,nc) route
    timed("t_3nc_incl_transpose_s",
          lambda x: loop(mv_t, x.T, iters).T, x3)
    # per-matvec effective bandwidth for the winner (bytes: diag+coef+x+y)
    byt = 4 * n * (1 + len(offsets) + 3 + 3)
    results["bytes_per_matvec_3comp"] = byt
    results["rows_GBps"] = round(byt * iters / results["rows_nc3_s"] / 1e9, 1)
    results["t_GBps"] = round(byt * iters / results["t_3nc_s"] / 1e9, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
