"""Where does the 512x512 f32 SIMPLE primal residual STOP?

bench.py round-3 switched from fixed-300-iteration timing to
run-to-convergence (primalMinResTol 1e-5) and the primal now exits failed:
res 1.23e-3 after the 2000-iteration cap. This prints the residual
trajectory on the chip so we can tell a stall/limit-cycle (PC/relaxation
problem) from an f32 residual floor (tolerance problem) from slow-but-
converging (budget problem).

The axon PJRT plugin does not support host callbacks (jax.debug.print),
so the trajectory is sampled by running CHUNK-iteration segments of the
same while_loop, warm-starting each from the last (identical arithmetic
to one long run except the convergence-check boundaries).

Env: PROBE_NW/PROBE_NR (default 512x512), PROBE_CHUNK (250),
PROBE_CHUNKS (16), PROBE_RELAX_P / PROBE_RELAX_U to test relaxation.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("PROBE_X64") == "1":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.solvers import make_solver

    nw = int(os.environ.get("PROBE_NW", "512"))
    nr = int(os.environ.get("PROBE_NR", "512"))
    chunk = int(os.environ.get("PROBE_CHUNK", "250"))
    n_chunks = int(os.environ.get("PROBE_CHUNKS", "16"))
    relax_p = float(os.environ.get("PROBE_RELAX_P", "0.2"))
    relax_u = float(os.environ.get("PROBE_RELAX_U", "0.5"))

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
        "primalMinIters": chunk, "primalMaxIters": chunk,
        "primalLinearSolver": {
            "pMaxIters": int(os.environ.get("PROBE_PMAX", "50")),
            "pRelTol": float(os.environ.get("PROBE_PTOL", "0.05")),
            "pPC": os.environ.get("PROBE_PPC", "jacobi"),
            "uMaxIters": 20, "uRelTol": 0.1,
            "turbMaxIters": 20, "turbRelTol": 0.1},
        "meshFaceLayout": os.environ.get("PROBE_LAYOUT", "auto"),
        "relaxationFactors": {"fields": {"p": relax_p},
                              "equations": {"U": relax_u, "nuTilda": 0.5}},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    if os.environ.get("PROBE_FUNCSTD") == "1":
        # bench-parity: CD-std tracked convergence loop (isolates the
        # tracked while_loop body for TPU fault bisection)
        opts["primalFuncStdTol"] = {"stdTol": 1e-12, "funcNames": ["CD"],
                                    "nStepsFrac": 0.2}
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    st = solver.init_state()
    traj = []
    for c in range(n_chunks):
        st, info = solver.run_primal(st, inputs)
        res = float(info.max_res)
        traj.append(res)
        print(f"[{(c + 1) * chunk:5d} iters] maxRes = {res:.6e}",
              file=sys.stderr, flush=True)
        if not bool(jax.numpy.all(jax.numpy.isfinite(st["p"]))):
            print("NON-FINITE state", file=sys.stderr, flush=True)
            break
    cd = float(solver.run_function("CD", st, inputs))
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "cells": topo.n_cells, "chunk": chunk,
        "relax_p": relax_p, "relax_u": relax_u,
        "traj": traj, "CD": cd}))


if __name__ == "__main__":
    main()
