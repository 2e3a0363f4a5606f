"""Round-5 on-chip adjoint experiment harness (512x512 bench case).

Loads the converged primal state from the bench checkpoint
(/tmp/bench_primal_ckpt.npz, any key) and then, per EXP_MODE:

  timing   — decompose per-iteration cost: one step-map vjp product
             alone, one K-iter GMRES cycle with/without deflation, and
             the per-call dispatch overhead (K=EXP_CHUNK).
  solve    — run the fp-adjoint to convergence with the given knobs,
             printing the trajectory (the bench's adjoint phase, but
             with every knob adjustable and no supervisor).

Knobs (env): EXP_SMOOTHER (line|mg|linear), EXP_CHUNK, EXP_RESTART,
EXP_DEFLATE, EXP_SCALE, EXP_RELAXP, EXP_THREAD_AUG=0|1, EXP_MAX_ITERS.

Usage: python scripts/adjoint_exp_r5.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))


def build_solver(nw, nr):
    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.solvers import make_solver

    nu = 1e-3
    uinf = [1.0, 0.0, 0.0]
    pts, topo = omesh_naca0012(n_wrap=nw, n_radial=nr, radius=15.0,
                               first_cell=4e-3)
    opts = {
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
        "primalMinIters": 300, "primalMaxIters": 300,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnSolMethod": "fixedPoint",
        "adjEqnOption": {
            "fpRelTol": 3e-7,
            "fpMaxIters": int(os.environ.get("EXP_CHUNK", "240")),
            "fpInnerScale": float(os.environ.get("EXP_SCALE", "0.4")),
            "fpInnerSmoother": os.environ.get("EXP_SMOOTHER", "line"),
            "fpRelaxFields": {"p": float(os.environ.get("EXP_RELAXP",
                                                        "0.7"))},
            "fpAcceleration": "gmres",
            "gmresRestart": int(os.environ.get("EXP_RESTART", "120")),
            "gmresDeflate": int(os.environ.get("EXP_DEFLATE", "16")),
            "gmresAbsTol": 1e-30,
            "pcType": "none"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    return make_solver(opts, topo, pts)


def load_state():
    d = np.load("/tmp/bench_primal_ckpt.npz", allow_pickle=False)
    st = {k[3:]: jnp.asarray(d[k]) for k in d.files if k.startswith("st_")}
    print(f"[exp] loaded primal checkpoint key={d['key']}", file=sys.stderr)
    return st


def main():
    t_start = time.perf_counter()

    def mark(msg):
        print(f"[exp +{time.perf_counter() - t_start:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    nw = int(os.environ.get("EXP_NW", "512"))
    nr = int(os.environ.get("EXP_NR", "512"))
    solver = build_solver(nw, nr)
    inputs = jax.tree_util.tree_map(jnp.asarray, solver.make_inputs())
    st = load_state()
    mode = os.environ.get("EXP_MODE", "timing")
    chunk = int(os.environ.get("EXP_CHUNK", "240"))
    n_defl = int(os.environ.get("EXP_DEFLATE", "16"))
    thread_aug = os.environ.get("EXP_THREAD_AUG", "1") == "1"

    if mode == "loopvjp":
        # in-loop backward-replay cost, no GMRES machinery: create the
        # vjp closure ONCE (like adjoint_solve_fp) and chain K products
        # inside a fori_loop — if this matches the GMRES ms/iter, the
        # regression is the step map's in-loop backward; if it matches
        # the standalone fused vjp, the regression is GMRES machinery.
        step = solver._fp_step_fn()
        K = chunk
        remat = os.environ.get("EXP_REMAT", "0") == "1"

        @jax.jit
        def loop_vjp(w, v):
            fn = lambda ww: step(ww, inputs)[0]  # noqa: E731
            if remat:
                fn = jax.checkpoint(fn)
            _, f_vjp = jax.vjp(fn, w)

            def body(i, acc):
                (g,) = f_vjp(acc)
                # keep magnitude bounded (chain is a power iteration)
                nrm = jnp.sqrt(sum(jnp.vdot(x, x).real
                                   for x in jax.tree_util.tree_leaves(g)))
                return jax.tree_util.tree_map(
                    lambda a: a / jnp.maximum(nrm, 1e-30), g)

            return jax.lax.fori_loop(0, K, body, v)

        v = jax.tree_util.tree_map(jnp.ones_like, st)
        mark(f"compiling loopvjp (K={K})")
        jax.block_until_ready(loop_vjp(st, v)["p"])
        t0 = time.perf_counter()
        out = loop_vjp(st, v)
        jax.block_until_ready(out["p"])
        t = time.perf_counter() - t0
        mark(f"loopvjp: {t:.2f} s for {K} chained products = "
             f"{t / K * 1e3:.1f} ms/product")
        print(json.dumps({"loopvjp_s": t, "K": K,
                          "ms_per_product": t / K * 1e3,
                          "smoother": os.environ.get("EXP_SMOOTHER",
                                                     "line")}))
        return

    if mode == "timing":
        # 1) step-map vjp product alone
        from dafoam_tpu.adjoint.solver import _scale  # noqa: F401
        step = solver._fp_step_fn()

        @jax.jit
        def one_step(w):
            s2, _ = step(w, inputs)
            return s2

        @jax.jit
        def vjp_product(w, v):
            _, f_vjp = jax.vjp(lambda ww: step(ww, inputs)[0], w)
            (g,) = f_vjp(v)
            return g

        v = jax.tree_util.tree_map(jnp.ones_like, st)
        mark("compiling forward step")
        jax.block_until_ready(one_step(st)["p"])
        t0 = time.perf_counter()
        for _ in range(10):
            out = one_step(st)
        jax.block_until_ready(out["p"])
        t_fwd = (time.perf_counter() - t0) / 10
        mark(f"forward step: {t_fwd * 1e3:.1f} ms")

        mark("compiling vjp product")
        jax.block_until_ready(vjp_product(st, v)["p"])
        t0 = time.perf_counter()
        for _ in range(10):
            g = vjp_product(st, v)
        jax.block_until_ready(g["p"])
        t_vjp = (time.perf_counter() - t0) / 10
        mark(f"step-map vjp product: {t_vjp * 1e3:.1f} ms "
             f"(NOTE: includes per-call vjp-closure forward re-exec)")

        # 2) one K-iter GMRES cycle (the bench's adj_cycle) + overhead
        def cycle_fn(s, p0, u0):
            return solver.solve_adjoint(s, inputs, "CD", psi0=p0,
                                        aug0=u0, return_aug=True)

        adj_cycle = jax.jit(cycle_fn)
        psi0 = jax.tree_util.tree_map(jnp.zeros_like, st)
        n_flat = sum(int(jnp.size(x)) for x in st.values())
        aug = jnp.zeros((max(n_defl, 1), n_flat), st["p"].dtype)
        mark(f"compiling adj cycle (chunk={chunk}, deflate={n_defl})")
        p1, a1, u1 = adj_cycle(st, psi0, aug)
        jax.block_until_ready(p1["p"])
        t0 = time.perf_counter()
        p2, a2, u2 = adj_cycle(st, p1, u1)
        jax.block_until_ready(p2["p"])
        t_cyc = time.perf_counter() - t0
        it2 = int(a2.iters)
        mark(f"adj cycle: {t_cyc:.2f} s for {it2} iters = "
             f"{t_cyc / max(it2, 1) * 1e3:.1f} ms/iter "
             f"(vjp share {t_vjp * it2:.2f} s)")
        out = {"fwd_ms": t_fwd * 1e3, "vjp_ms": t_vjp * 1e3,
               "cycle_s": t_cyc, "cycle_iters": it2,
               "ms_per_iter": t_cyc / max(it2, 1) * 1e3,
               "smoother": os.environ.get("EXP_SMOOTHER", "line")}
        print(json.dumps(out))
        return

    # mode == solve: convergence trajectory
    fp_tol = float(os.environ.get("EXP_FP_TOL", "1e-6"))
    fp_max = int(os.environ.get("EXP_MAX_ITERS", "22000"))

    def cycle_fn(s, p0, u0):
        return solver.solve_adjoint(s, inputs, "CD", psi0=p0,
                                    aug0=u0, return_aug=True)

    adj_cycle = jax.jit(cycle_fn)
    psi = jax.tree_util.tree_map(jnp.zeros_like, st)
    n_flat = sum(int(jnp.size(x)) for x in st.values())
    aug = jnp.zeros((max(n_defl, 1), n_flat), st["p"].dtype)
    mark(f"compiling adj cycle (smoother="
         f"{os.environ.get('EXP_SMOOTHER', 'line')}, chunk={chunk}, "
         f"restart={os.environ.get('EXP_RESTART', '120')}, "
         f"deflate={n_defl}, thread_aug={thread_aug})")
    jax.block_until_ready(adj_cycle(st, psi, aug)[0]["p"])
    mark("compiled; timed convergence run")
    t_sum, n, r0g, rel = 0.0, 0, None, float("inf")
    while n < fp_max:
        t0 = time.perf_counter()
        psi, ai, aug_new = adj_cycle(st, psi, aug)
        jax.block_until_ready(psi["p"])
        t_sum += time.perf_counter() - t0
        if thread_aug:
            aug = aug_new
        n += int(ai.iters)
        r0g = float(ai.resid0) if r0g is None else r0g
        rel = float(ai.resid) / r0g
        mark(f"  adj @{n}: rel={rel:.2e} ({t_sum:.0f}s)")
        if rel < fp_tol:
            break
    print(json.dumps({"iters": n, "rel": rel, "t_adj": t_sum,
                      "converged": rel < fp_tol,
                      "smoother": os.environ.get("EXP_SMOOTHER", "line"),
                      "chunk": chunk,
                      "restart": os.environ.get("EXP_RESTART", "120"),
                      "deflate": n_defl, "thread_aug": thread_aug}))


if __name__ == "__main__":
    main()
