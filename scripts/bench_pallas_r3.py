"""Round-3 Pallas kernel micro-bench: flat vs tiled vs multi-component.

Synthetic DIA bands (no mesh build), O-mesh-like offsets. Reports
us/matvec and effective GB/s vs the ~820 GB/s v5e HBM roofline for:

  n=262k  : XLA banded | flat VMEM kernel | grid-tiled kernel
  n=2.1M  : XLA banded | grid-tiled kernel          (flat cap exceeded)
  (3,262k): XLA (nc,3) row-major | XLA (3,nc) | multi kernel (3,nc)

Run on the chip: python scripts/bench_pallas_r3.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFS = (-513, -512, -1, 1, 512, 513)
LO, HI = 513, 513


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    from dafoam_tpu.ops import pallas_kernels as pk

    out = {"platform": jax.devices()[0].platform, "offsets": list(OFFS)}
    k = len(OFFS)

    def timeit(f, x, n=200):
        g = jax.jit(f)
        jax.block_until_ready(g(x))
        t0 = time.perf_counter()
        v = x
        for _ in range(n):
            v = g(v)
        jax.block_until_ready(v)
        return (time.perf_counter() - t0) / n

    def xla_mv(diag, coef, x):
        y = diag * x
        xp = jnp.pad(x, (LO, HI))
        for i, o in enumerate(OFFS):
            y = y + coef[i] * jax.lax.slice_in_dim(xp, LO + o, LO + o + x.shape[0])
        return y

    for n in (262_144, 2_097_152):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        diag = jax.random.normal(k1, (n,), jnp.float32) + 8.0
        coef = jax.random.normal(k2, (k, n), jnp.float32)
        x = jax.random.normal(k3, (n,), jnp.float32)
        byt = 4 * n * (k + 3)
        row = {}
        row["xla_us"] = round(timeit(lambda v: xla_mv(diag, coef, v), x) * 1e6, 1)
        if pk.dia_matvec_supported(n, k, x.dtype):
            row["flat_us"] = round(timeit(
                lambda v: pk.dia_matvec(diag, coef, OFFS, v), x) * 1e6, 1)
        row["tiled_us"] = round(timeit(
            lambda v: pk.dia_matvec_tiled(diag, coef, OFFS, v), x) * 1e6, 1)
        for kk in list(row):
            row[kk.replace("_us", "_GBps")] = round(byt / row[kk] / 1e3, 1)
        out[f"n{n}"] = row

    # multi-component (momentum) at 262k
    n = 262_144
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    diag = jax.random.normal(k1, (n,), jnp.float32) + 8.0
    coef = jax.random.normal(k2, (k, n), jnp.float32)
    x3 = jax.random.normal(k3, (3, n), jnp.float32)
    byt3 = 4 * n * (k + 1 + 6)

    def xla_rows(v):  # (n,3) cell-major
        y = diag[:, None] * v
        xp = jnp.pad(v, ((LO, HI), (0, 0)))
        for i, o in enumerate(OFFS):
            y = y + coef[i][:, None] * jax.lax.slice_in_dim(
                xp, LO + o, LO + o + n, axis=0)
        return y

    def xla_t(v):  # (3,n) component-major
        y = diag[None, :] * v
        xp = jnp.pad(v, ((0, 0), (LO, HI)))
        for i, o in enumerate(OFFS):
            y = y + coef[i][None, :] * jax.lax.slice_in_dim(
                xp, LO + o, LO + o + n, axis=1)
        return y

    row = {"xla_nc3_us": round(timeit(xla_rows, x3.T.copy()) * 1e6, 1),
           "xla_3nc_us": round(timeit(xla_t, x3) * 1e6, 1)}
    if pk.dia_matvec_multi_supported(n, 3, k, jnp.float32):
        row["multi_us"] = round(timeit(
            lambda v: pk.dia_matvec_multi(diag, coef, OFFS, v), x3) * 1e6, 1)
    row["multi_tiled_us"] = round(timeit(
        lambda v: pk.dia_matvec_multi_tiled(diag, coef, OFFS, v), x3) * 1e6, 1)
    for kk in list(row):
        row[kk.replace("_us", "_GBps")] = round(byt3 / row[kk] / 1e3, 1)
    out["momentum_3x262k"] = row
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
