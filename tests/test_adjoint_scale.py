"""Mid-scale iterations-to-tolerance regression for the fixed-point
adjoint (VERDICT r3 weak #2: convergence-at-scale was tested nowhere
between the 12x12 toy and the 512x512 driver bench, so a PC/smoother
regression would only be caught by the driver's bench failing).

Locks, on the bench-protocol NACA-SA O-mesh at 96x48 (the scale
scripts/fp_adjoint_study.py characterized), that the fixed-point GMRES
adjoint with the production smoother + deflated restarts reaches the
production tolerance (reference bar: relTol 1e-6, pyDAFoam.py:526-548)
within a budget that a healthy configuration beats comfortably.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh.airfoil import omesh_naca0012
from dafoam_tpu.mesh.topology import to_dia_dense
from dafoam_tpu.solvers import make_solver


def _solver(nw=96, nr=48, smoother="mg", deflate=8, restart=120):
    nu = 1e-3
    uinf = [1.0, 0.0, 0.0]
    pts, topo = omesh_naca0012(n_wrap=nw, n_radial=nr, radius=15.0,
                               first_cell=4e-3)
    topo = to_dia_dense(topo)  # bench layout (auto on TPU; forced here)
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
        "primalMinIters": 1500, "primalMaxIters": 1500,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnSolMethod": "fixedPoint",
        "adjEqnOption": {"fpRelTol": 1e-6, "fpMaxIters": 600,
                         "fpInnerScale": 0.4, "fpInnerSmoother": smoother,
                         "fpAcceleration": "gmres",
                         "gmresRestart": restart, "gmresAbsTol": 1e-30,
                         "gmresDeflate": deflate, "pcType": "none"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    return make_solver(opts, topo, pts)


@pytest.mark.slow
def test_fp_adjoint_iters_to_tol_midscale():
    solver = _solver()
    inputs = solver.make_inputs()
    st, info = solver.run_primal(solver.init_state(), inputs)
    assert not bool(info.failed)
    psi, ai = solver.solve_adjoint(st, inputs, "CD")
    rel = float(ai.resid) / float(ai.resid0)
    # healthy config measured well under this budget; a smoother/deflation
    # regression blows straight through it
    assert rel < 1e-6, f"adjoint stalled: rel={rel:.3e} after " \
                       f"{int(ai.iters)} iters"
    assert int(ai.iters) <= 480, int(ai.iters)
    # and the totals it feeds are finite
    tot = solver.total_derivative(st, inputs, "CD", psi)
    assert bool(jnp.all(jnp.isfinite(tot["points"])))
