"""adjEqnSolMethod: fixedPoint — solver-level adjoint of the primal step
map (reference runFPAdj, DASimpleFoam.C:189; option pyDAFoam.py:333,
540-543; DATurbulenceModel.H:270-289 solveAdjointFP).

The fixed-point path must reproduce the Krylov adjoint's total derivative
on the lid-driven-cavity case, in both acceleration modes (GMRES on
I - dG^T, and plain Richardson sweeps = reference parity).
"""

import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver


def make_case(adj_method, adj_extra=None, opts_extra=None):
    n = 12
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
            "p": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": [0.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 1e-10, "primalMaxIters": 2000,
        "relaxationFactors": {"fields": {"p": 0.3},
                              "equations": {"U": 0.7}},
        "function": {"LidForce": {"type": "force", "patches": ["ymax"],
                                  "directionMode": "fixedDirection",
                                  "direction": [1.0, 0.0, 0.0],
                                  "scale": 1.0}},
        "adjEqnSolMethod": adj_method,
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 200,
                         "gmresMaxIters": 1000, "pcType": "segregated",
                         "fpRelTol": 1e-10, "fpMaxIters": 4000,
                         "fpRelaxation": 1.0,
                         "jitMode": "traced"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    if adj_extra:
        opts["adjEqnOption"].update(adj_extra)
    if opts_extra:
        opts.update(opts_extra)
    solver = make_solver(opts, topo, pts)
    return solver


def test_fixedpoint_line_smoother_matches_krylov():
    """fpInnerSmoother 'line' (ADI line solves as the step map's inner
    defect correction — the at-scale TPU configuration, see
    fvsolve.solve_fixed) must reproduce the Krylov totals like the
    Chebyshev/Jacobi 'linear' smoother does. Needs the dense-DIA layout
    (forced here; 'auto' only enables it on TPU)."""
    dense = {"meshFaceLayout": "diaDense"}
    kry = make_case("Krylov", opts_extra=dense)
    inputs = kry.make_inputs()
    state, info = kry.run_primal(kry.init_state(), inputs)
    assert not bool(info.failed)
    psi_k, ik = kry.solve_adjoint(state, inputs, "LidForce")
    assert bool(ik.converged)
    tot_k = kry.total_derivative(state, inputs, "LidForce", psi_k)

    fp = make_case("fixedPoint",
                   {"fpAcceleration": "gmres", "fpInnerMode": "fixed",
                    "fpInnerSmoother": "line"}, opts_extra=dense)
    # verify the line path is actually reachable on this topology
    from dafoam_tpu.linalg.lines import line_directions
    assert line_directions(fp.topo)
    psibar, jf = fp.solve_adjoint(state, inputs, "LidForce")
    assert bool(jf.converged), (int(jf.iters), float(jf.resid))
    assert int(jf.iters) < int(info.iters)
    tot_f = fp.total_derivative(state, inputs, "LidForce", psibar)

    np.testing.assert_allclose(np.asarray(tot_f["params"]["nu"]),
                               np.asarray(tot_k["params"]["nu"]),
                               rtol=1e-6, atol=1e-12)
    pk = np.asarray(tot_k["points"])
    scale = max(1.0, np.abs(pk).max())
    np.testing.assert_allclose(np.asarray(tot_f["points"]), pk,
                               rtol=5e-6, atol=1e-7 * scale)


@pytest.mark.parametrize("accel,inner", [("gmres", "fixed"),
                                         ("gmres", "implicit"),
                                         ("richardson", "fixed")])
def test_fixedpoint_matches_krylov(accel, inner):
    """Both inner-solve modes must reproduce the Krylov totals:
    "implicit" (custom_linear_solve, tight transposes) by the
    implicit-function rule, "fixed" (scan smoothers, plain AD transpose)
    because at a converged primal any smooth approximate inverse in the
    step map yields exact totals (fvsolve.solve_fixed)."""
    kry = make_case("Krylov")
    inputs = kry.make_inputs()
    state, info = kry.run_primal(kry.init_state(), inputs)
    assert not bool(info.failed)

    psi_k, ik = kry.solve_adjoint(state, inputs, "LidForce")
    assert bool(ik.converged), (int(ik.iters), float(ik.resid))
    tot_k = kry.total_derivative(state, inputs, "LidForce", psi_k)

    fp = make_case("fixedPoint", {"fpAcceleration": accel,
                                  "fpInnerMode": inner})
    psibar, jf = fp.solve_adjoint(state, inputs, "LidForce")
    assert bool(jf.converged), (int(jf.iters), float(jf.resid),
                                float(jf.resid0))
    # GMRES on I - dG^T needs FAR fewer iterations than the primal took
    if accel == "gmres":
        assert int(jf.iters) < int(info.iters)
    tot_f = fp.total_derivative(state, inputs, "LidForce", psibar)

    dk = np.asarray(tot_k["params"]["nu"])
    df = np.asarray(tot_f["params"]["nu"])
    np.testing.assert_allclose(df, dk, rtol=1e-6, atol=1e-12)
    # points (shape) totals must agree too
    pk = np.asarray(tot_k["points"])
    pf = np.asarray(tot_f["points"])
    scale = max(1.0, np.abs(pk).max())
    np.testing.assert_allclose(pf, pk, rtol=5e-6, atol=1e-7 * scale)
