"""Benchmark: SIMPLE incompressible primal throughput + adjoint solve.

Runs the flagship DASimpleFoam case on the default JAX platform (the real
TPU chip under the driver; CPU if forced) in float32 and reports
cell-iterations/second for the fully fused, device-resident SIMPLE loop.

Baseline: the reference (mdolab/dafoam) publishes no benchmark numbers
(SURVEY.md §6, BASELINE.json published: {}). For vs_baseline we use a
documented nominal: OpenFOAM-class SIMPLE solvers sustain ~5e4
cell-iterations/s/rank; the north-star comparison target is 64 MPI ranks
=> 3.2e6 cell-iters/s.
"""

import json
import os
import sys
import time

REF_CELL_ITERS_PER_SEC = 3.2e6  # 64-rank MPI DAFoam-class nominal

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
    import jax.numpy as jnp

    from dafoam_tpu.mesh import box_hex_mesh
    from dafoam_tpu.solvers import make_solver

    n = int(os.environ.get("BENCH_N", "96"))
    iters = int(os.environ.get("BENCH_ITERS", "200"))

    pts, topo = box_hex_mesh(n, n, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.001},
        "boundaryConditions": {
            "U": {"ymax": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "ymin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "xmin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "xmax": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {"ymax": {"type": "zeroGradient"},
                  "ymin": {"type": "zeroGradient"},
                  "xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [0.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 0.0,          # fixed-iteration timing mode
        "primalMinIters": iters,
        "primalMaxIters": iters,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "relaxationFactors": {"fields": {"p": 0.3}, "equations": {"U": 0.7}},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    st0 = solver.init_state()

    # warm-up/compile
    st, info = solver.run_primal(st0, inputs)
    jax.block_until_ready(st["p"])
    # timed
    t0 = time.perf_counter()
    st, info = solver.run_primal(st0, inputs)
    jax.block_until_ready(st["p"])
    dt = time.perf_counter() - t0

    cell_iters = topo.n_cells * iters / dt
    out = {
        "metric": f"SIMPLE cavity {n}x{n} primal throughput "
                  f"({iters} fused SIMPLE iters, {jax.devices()[0].platform})",
        "value": round(cell_iters, 1),
        "unit": "cell-iterations/s",
        "vs_baseline": round(cell_iters / REF_CELL_ITERS_PER_SEC, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
