"""Where does the 512x512 f32 SIMPLE primal residual STOP?

bench.py round-3 switched from fixed-300-iteration timing to
run-to-convergence (primalMinResTol 1e-5) and the primal now exits failed:
res 1.23e-3 after the 2000-iteration cap. This prints the residual
trajectory on the chip so we can tell a stall/limit-cycle (PC/relaxation
problem) from an f32 residual floor (tolerance problem) from slow-but-
converging (budget problem).

Env: PROBE_NW/PROBE_NR (default 512x512), PROBE_ITERS (default 4000).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import json

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.solvers import make_solver

    nw = int(os.environ.get("PROBE_NW", "512"))
    nr = int(os.environ.get("PROBE_NR", "512"))
    iters = int(os.environ.get("PROBE_ITERS", "4000"))

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
        "primalMinResTol": 1e-12, "primalMinIters": 10,
        "primalMaxIters": iters,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
        "printToScreen": True, "printInterval": 100,
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    st, info = solver.run_primal(solver.init_state(), inputs)
    jax.block_until_ready(st["p"])
    cd = float(solver.run_function("CD", st, inputs))
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "cells": topo.n_cells, "iters": int(info.iters),
        "max_res": float(info.max_res), "failed": bool(info.failed),
        "CD": cd}))


if __name__ == "__main__":
    main()
