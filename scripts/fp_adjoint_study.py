"""Fixed-point-adjoint cost/convergence study on the NACA SA case.

VERDICT r2 item 1 follow-up: the Krylov adjoint stalls on the NACA O-mesh
with every block PC; the step-map fixed-point adjoint (adjoint_solve_fp)
converges at the primal's own rate. This script measures, at a given mesh
size, (a) primal time, (b) FP adjoint iterations + wall-clock to fpRelTol
for the chosen inner mode, and (c) totals agreement vs the "implicit"
(custom_linear_solve) mode as an accuracy cross-check.

Usage: python scripts/fp_adjoint_study.py [nw nr] [innerScale]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("STUDY_PLATFORM", "cpu"))
if os.environ.get("STUDY_X64", "1") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import numpy as np

from scripts.pc_convergence_study import build


def main():
    nw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    nr = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

    solver = build(nw, nr, "none")
    solver.option.set("adjEqnSolMethod", "fixedPoint")
    solver.option.set("adjEqnOption.fpRelTol", 1e-6)
    solver.option.set("adjEqnOption.fpMaxIters", 600)
    solver.option.set("adjEqnOption.fpInnerScale", scale)
    inputs = solver.make_inputs()

    t0 = time.perf_counter()
    state, info = solver.run_primal(solver.init_state(), inputs)
    jax.block_until_ready(state["p"])
    t_pr = time.perf_counter() - t0
    print(f"primal: iters={int(info.iters)} res={float(info.max_res):.2e} "
          f"{t_pr:.1f}s ({solver.topo.n_cells} cells)", flush=True)

    for mode in ("fixed", "implicit"):
        solver.option.set("adjEqnOption.fpInnerMode", mode)
        t0 = time.perf_counter()
        psibar, ai = solver.solve_adjoint(state, inputs, "CD")
        jax.block_until_ready(psibar["p"])
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        psibar, ai = solver.solve_adjoint(state, inputs, "CD")
        jax.block_until_ready(psibar["p"])
        t_adj = time.perf_counter() - t0
        tot = solver.total_derivative(state, inputs, "CD", psibar)
        dnu = float(np.asarray(tot["params"]["nu"]))
        print(f"fp[{mode}] iters={int(ai.iters)} rel={float(ai.resid/ai.resid0):.2e} "
              f"conv={bool(ai.converged)} adj={t_adj:.1f}s "
              f"(compile+run {t_compile:.1f}s) dCD/dnu={dnu:.8e}", flush=True)


if __name__ == "__main__":
    main()
