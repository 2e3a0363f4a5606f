"""Adjoint-PC convergence study: iterations-to-tolerance per pcType.

VERDICT r2 item 1: the bench adjoint did not converge (rel resid 6.7e-3
after the 120-iteration budget with the segregated PC). This script runs
the NACA SA case at a configurable size and reports, for each pcType,
the FGMRES iteration count and residual at a production tolerance
(reference bar: relTol 1e-6, pyDAFoam.py:526-548).

Usage: [JAX_PLATFORMS=cpu] python scripts/pc_convergence_study.py [nw nr]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(nw, nr, pctype, extra=None):
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
        "primalMinResTol": 1e-8, "primalMinIters": 100,
        "primalMaxIters": 1500,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-6, "gmresRestart": 120,
                         "gmresMaxIters": 500, "pcType": pctype,
                         "pcInnerIters": 10, "jitMode": "traced"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    if extra:
        opts["adjEqnOption"].update(extra)
    solver = make_solver(opts, topo, pts)
    return solver


def main():
    import jax

    nw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    nr = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    variants = [
        ("segregated", None),
        ("lineJacobi", None),
        ("coupledLine", {"pcCoupledSweeps": 2}),
        ("coupledLine", {"pcCoupledSweeps": 3}),
    ]
    state = None
    for pctype, extra in variants:
        solver = build(nw, nr, pctype, extra)
        inputs = solver.make_inputs()
        if state is None:
            t0 = time.perf_counter()
            state, info = solver.run_primal(solver.init_state(), inputs)
            jax.block_until_ready(state["p"])
            print(f"primal: iters={int(info.iters)} "
                  f"res={float(info.max_res):.3e} "
                  f"[{time.perf_counter() - t0:.1f}s]", flush=True)
        t0 = time.perf_counter()
        psi, ai = solver.run_adjoint("CD", state, inputs)
        jax.block_until_ready(psi["p"])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        psi, ai = solver.run_adjoint("CD", state, inputs)
        jax.block_until_ready(psi["p"])
        t2 = time.perf_counter() - t0
        rel = float(ai.resid) / max(float(ai.resid0), 1e-300)
        print(json.dumps({
            "pcType": pctype, "extra": extra,
            "iters": int(ai.iters), "rel_resid": rel,
            "converged": bool(ai.converged),
            "t_compile+run": round(t1, 2), "t_run": round(t2, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
