"""NACA0012 drag minimization with FFD shape variables — the north-star
workflow (mesh -> SA-RANS primal -> drag adjoint -> FFD chain -> SLSQP).

Run:  python examples/naca0012_drag_opt.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np

from dafoam_tpu.mesh.airfoil import omesh_naca0012
from dafoam_tpu.mdo import FFDBox
from dafoam_tpu.mdo.optimize import ShapeOptProblem
from dafoam_tpu.solvers import make_solver

NU = 1e-3
U_INF = [1.0, 0.0, 0.0]

pts, topo = omesh_naca0012(n_wrap=64, n_radial=24, radius=15.0,
                           first_cell=3e-3)
options = {
    "solverName": "DASimpleFoam",
    "turbulenceModel": "SpalartAllmaras",
    "divSchemes": {"div(phi,U)": "linearUpwind"},
    "transportProperties": {"nu": NU},
    "boundaryConditions": {
        "U": {"far": {"type": "inletOutlet", "value": U_INF},
              "wing": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
        "p": {"far": {"type": "fixedValue", "value": 0.0},
              "wing": {"type": "zeroGradient"}},
        "nuTilda": {"far": {"type": "inletOutlet", "value": 3 * NU},
                    "wing": {"type": "fixedValue", "value": 0.0}},
    },
    "initialFields": {"U": U_INF, "p": 0.0, "nuTilda": 3 * NU},
    "primalMinResTol": 1e-9,
    "primalMaxIters": 2000,
    "relaxationFactors": {"fields": {"p": 0.2},
                          "equations": {"U": 0.5, "nuTilda": 0.5}},
    "function": {
        "CD": {"type": "force", "patches": ["wing"],
               "directionMode": "fixedDirection",
               "direction": [1.0, 0.0, 0.0], "scale": 1.0},
        "CL": {"type": "force", "patches": ["wing"],
               "directionMode": "fixedDirection",
               "direction": [0.0, 1.0, 0.0], "scale": 1.0},
    },
    "adjEqnOption": {"gmresRelTol": 1e-8, "gmresRestart": 400,
                     "gmresMaxIters": 3000, "pcType": "segregated"},
    "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0, "nuTilda": 3 * NU},
}
solver = make_solver(options, topo, pts)

ffd = FFDBox(pts, nx=8, ny=4, nz=2,
             bounds=([-0.1, -0.2, -1.0], [1.1, 0.2, 1.1]))
nx, ny, nz = ffd.shape
ix, iy = np.arange(1, nx - 1), np.arange(1, ny - 1)
n_dv = len(ix) * len(iy)
pts0 = jnp.asarray(pts, solver.dtype)


def geo_fn(dv):
    dcp = jnp.zeros((nx, ny, nz, 3), solver.dtype)
    vals = dv.reshape(len(ix), len(iy))
    for a, i in enumerate(ix):
        for b, j in enumerate(iy):
            dcp = dcp.at[i, j, :, 1].set(vals[a, b])
    return ffd(pts0, dcp)


prob = ShapeOptProblem(solver, geo_fn, "CD")
funcs, st, inp = prob.eval_all(np.zeros(n_dv))
print("baseline CD =", funcs["CD"])
res = prob.run(np.zeros(n_dv), bounds=[(-0.03, 0.03)] * n_dv, maxiter=10)
print("optimized CD =", res.fun, " (%d evals)" % len(prob.history))
