"""DASimpleFoam + SpalartAllmaras: turbulent channel, adjoint vs FD.

Covers the reference's DASimpleFoam+SA north-star path (SURVEY.md §7
step 4) on a small channel: model state (nuTilda) in the adjoint state
vector, SA transport residual in R(W), frozen wall distance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NU = 1e-4


def channel():
    pts, topo = box_hex_mesh(16, 8, 1, (1.0, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "SpalartAllmaras",
        "transportProperties": {"nu": NU},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "fixedValue", "value": zero}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "nuTilda": {"xmin": {"type": "fixedValue", "value": 3 * NU},
                        "xmax": {"type": "zeroGradient"},
                        "ymin": {"type": "fixedValue", "value": 0.0},
                        "ymax": {"type": "fixedValue", "value": 0.0}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0, "nuTilda": 3 * NU},
        "primalMinResTol": 1e-11,
        "primalMaxIters": 1000,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {
            "drag": {"type": "force", "patches": ["ymin", "ymax"],
                     "directionMode": "fixedDirection",
                     "direction": [1.0, 0.0, 0.0], "scale": 1.0},
            "outP0": {"type": "totalPressure", "patches": ["xmax"],
                      "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 2000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * NU},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def case():
    solver, inputs = channel()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, state, info


def test_sa_primal(case):
    solver, inputs, state, info = case
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    nut = np.asarray(solver.turb.nut(state, inputs, solver.geometry(inputs)))
    assert (nut >= 0).all() and nut.max() > 0  # turbulence active
    r = solver.residuals(state, inputs)
    for k, v in r.items():
        assert np.abs(np.asarray(v)).max() < 1e-8, k


def test_sa_adjoint_vs_fd(case):
    solver, inputs, state, info = case
    psi, ai = solver.run_adjoint("drag", state, inputs)
    assert float(ai.resid) <= 1e-9
    tot = solver.run_totals("drag", state, inputs, psi)
    dux = float(tot["bc"]["U"]["xmin"][0])
    dnut_in = float(tot["bc"]["nuTilda"]["xmin"])

    def runJ(uin=1.0, ntin=3 * NU):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["U"]["xmin"] = jnp.asarray([uin, 0.0, 0.0], solver.dtype)
        inp["bc"]["nuTilda"]["xmin"] = jnp.asarray(ntin, solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("drag", st, inp))

    eps = 1e-6
    fd_u = (runJ(uin=1 + eps) - runJ(uin=1 - eps)) / (2 * eps)
    assert dux == pytest.approx(fd_u, rel=2e-5)
    eps = 1e-9
    fd_nt = (runJ(ntin=3 * NU + eps) - runJ(ntin=3 * NU - eps)) / (2 * eps)
    assert dnut_in == pytest.approx(fd_nt, rel=2e-5)
