"""Decompose the adjoint FGMRES iteration cost at bench scale.

All pieces are measured as SELF-CONTAINED jitted programs (the axon remote
compiler rejects programs with large baked-in constants, so every array is
a traced argument). Run: python scripts/profile_adjoint.py [NW NR]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp


def bench_opts(nu):
    uinf = [1.0, 0.0, 0.0]
    return {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "SpalartAllmaras",
        "transportProperties": {"nu": nu},
        "boundaryConditions": {
            "U": {"far": {"type": "inletOutlet", "value": uinf},
                  "wing": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {"far": {"type": "fixedValue", "value": 0.0},
                  "wing": {"type": "zeroGradient"}},
            "nuTilda": {"far": {"type": "inletOutlet", "value": 3 * nu},
                        "wing": {"type": "fixedValue", "value": 0.0}},
        },
        "initialFields": {"U": uinf, "p": 0.0, "nuTilda": 3 * nu},
        "primalMinResTol": 0.0,
        "primalMinIters": 50, "primalMaxIters": 50,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-5, "gmresRestart": 120,
                         "gmresMaxIters": 120, "pcType": "segregated",
                         "pcInnerIters": 10},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }


def timeit(fn, *args, n=10, block=None):
    out = fn(*args)
    jax.block_until_ready(block(out) if block else out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(block(out) if block else out)
    return (time.perf_counter() - t0) / n


def main():
    nw = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    nr = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.solvers import make_solver

    pts, topo0 = omesh_naca0012(n_wrap=nw, n_radial=nr, radius=15.0,
                                first_cell=4e-3)
    solver = make_solver(bench_opts(1e-3), topo0, pts)
    topo = solver.topo
    inputs = solver.make_inputs()
    st, info = solver.run_primal(solver.init_state(), inputs)
    jax.block_until_ready(st["p"])
    print(f"primal done nc={topo.n_cells}", flush=True)

    # ---- residual forward eval -----------------------------------------
    resj = jax.jit(lambda w, x: solver._norm_residuals(w, x))
    t = timeit(resj, st, inputs, block=lambda r: r["p"])
    print(f"residual eval: {t*1e3:.2f} ms", flush=True)

    # ---- matvec: linearize once inside jit, apply K times --------------
    def mvK(w, x, v, K):
        _, pb = jax.vjp(lambda ww: solver._norm_residuals(ww, x), w)

        def body(_, vv):
            return pb(vv)[0]
        return jax.lax.fori_loop(0, K, body, v)

    v0 = jax.tree_util.tree_map(jnp.ones_like, st)
    mv1 = jax.jit(lambda w, x, v: mvK(w, x, v, 1))
    mv21 = jax.jit(lambda w, x, v: mvK(w, x, v, 21))
    t1 = timeit(mv1, st, inputs, v0, n=5, block=lambda r: r["p"])
    t21 = timeit(mv21, st, inputs, v0, n=5, block=lambda r: r["p"])
    print(f"vjp matvec (amortized): {(t21-t1)/20*1e3:.2f} ms; "
          f"1-apply program {t1*1e3:.2f} ms", flush=True)

    # ---- PC apply -------------------------------------------------------
    from dafoam_tpu.adjoint.precond import make_block_pc
    geom = solver.geometry(inputs)

    def pcK(w, x, v, K):
        pc = solver.make_adjoint_pc(w, x)

        def body(_, vv):
            return pc(vv)
        return jax.lax.fori_loop(0, K, body, v)

    pc1 = jax.jit(lambda w, x, v: pcK(w, x, v, 1))
    pc21 = jax.jit(lambda w, x, v: pcK(w, x, v, 21))
    t1 = timeit(pc1, st, inputs, v0, n=5, block=lambda r: r["p"])
    t21 = timeit(pc21, st, inputs, v0, n=5, block=lambda r: r["p"])
    print(f"PC apply (amortized): {(t21-t1)/20*1e3:.2f} ms; "
          f"1-apply program {t1*1e3:.2f} ms", flush=True)

    # ---- MGS orthogonalization vs full 121-row basis --------------------
    flat, _ = jax.flatten_util.ravel_pytree(v0)
    n = flat.shape[0]
    m = 121

    def orthK(V, w, K):
        def body(_, ww):
            h = V @ ww
            ww = ww - V.T @ h
            h2 = V @ ww
            return ww - V.T @ h2
        return jax.lax.fori_loop(0, K, body, w)

    V = jnp.ones((m, n), jnp.float32) / jnp.sqrt(n)
    o1 = jax.jit(lambda V, w: orthK(V, w, 1))
    o21 = jax.jit(lambda V, w: orthK(V, w, 21))
    w0 = flat.astype(jnp.float32)
    t1 = timeit(o1, V, w0, n=5)
    t21 = timeit(o21, V, w0, n=5)
    print(f"MGS 2-pass (m={m}, n={n}) amortized: {(t21-t1)/20*1e3:.2f} ms",
          flush=True)

    # ---- full adjoint solves: with and without PC -----------------------
    for pctype, label in (("segregated", "pc=segregated"), ("none", "pc=none")):
        solver.option.set("adjEqnOption.pcType", pctype)
        solver._jit_cache = {}
        psi, ai = solver.run_adjoint("CD", st, inputs)
        jax.block_until_ready(psi["p"])
        t0 = time.perf_counter()
        psi, ai = solver.run_adjoint("CD", st, inputs)
        jax.block_until_ready(psi["p"])
        dt = time.perf_counter() - t0
        print(f"adjoint {label}: {dt:.2f} s, iters={int(ai.iters)}, "
              f"res {float(ai.resid0):.2e}->{float(ai.resid):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
