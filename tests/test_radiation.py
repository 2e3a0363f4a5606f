"""P1 radiation model in the heat solver (reference DARadiationModel/DAP1):
coupled T-G primal + adjoint w.r.t. absorptivity vs FD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver


def case():
    pts, topo = box_hex_mesh(10, 6, 1, (1.0, 0.5, 0.05),
                             kinds={"zmin": "empty", "zmax": "empty"})
    opts = {
        "solverName": "DAHeatTransferFoam",
        "transportProperties": {"kappa": 10.0},
        "boundaryConditions": {
            "T": {"xmin": {"type": "fixedValue", "value": 1000.0},
                  "xmax": {"type": "fixedValue", "value": 400.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "G": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"T": 700.0, "G": 4.0 * 5.67e-8 * 700.0 ** 4},
        "primalMinResTol": 1e-7, "primalMaxIters": 200,
        "function": {"Tm": {"type": "variableVolSum", "varName": "T",
                            "scale": 1.0, "divByTotalVol": 1}},
        "normalizeStates": {"T": 700.0, "G": 5e4},
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 200,
                         "gmresMaxIters": 1500, "pcType": "none"},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    inputs["params"]["radiationAbsorptivity"] = jnp.asarray(0.5,
                                                            solver.dtype)
    return solver, inputs


def test_p1_radiation_adjoint_vs_fd():
    solver, inputs = case()
    st, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    assert float(st["G"].min()) > 0  # incident radiation positive

    psi, ai = solver.run_adjoint("Tm", st, inputs)
    assert bool(ai.converged)
    tot = solver.run_totals("Tm", st, inputs, psi)
    da = float(tot["params"]["radiationAbsorptivity"])

    def runJ(a):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["radiationAbsorptivity"] = jnp.asarray(a, solver.dtype)
        s2, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("Tm", s2, inp))

    eps = 1e-6
    fd = (runJ(0.5 + eps) - runJ(0.5 - eps)) / (2 * eps)
    assert da == pytest.approx(fd, rel=1e-5), (da, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46)
    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["params"]["radiationAbsorptivity"] = jnp.ones((), solver.dtype)
    dJ_fwd, _ = solver.forward_total_derivative(st, inputs, "Tm", dx)
    assert da == pytest.approx(float(dJ_fwd), rel=1e-6), (da, float(dJ_fwd))
