"""DARhoSimpleFoam: compressible heated channel, adjoint vs FD
(reference runRegTests_DARhoSimpleFoam* role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

UIN = 50.0


def channel():
    pts, topo = box_hex_mesh(16, 8, 1, (1.0, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    opts = {
        "solverName": "DARhoSimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"mu": 1.8e-5, "Cp": 1004.5, "R": 287.0,
                                "Pr": 0.7},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [UIN, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "ymax": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 101325.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "T": {"xmin": {"type": "fixedValue", "value": 300.0},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": 350.0},
                  "ymax": {"type": "fixedValue", "value": 350.0}},
        },
        "initialFields": {"U": [UIN, 0.0, 0.0], "p": 101325.0, "T": 300.0},
        "primalMinResTol": 5e-9,
        "primalMaxIters": 1000,
        "primalVarBounds": {"UMin": -1000.0, "UMax": 1000.0,
                            "pMin": 20000.0, "pMax": 500000.0,
                            "TMin": 100.0, "TMax": 1000.0},
        "relaxationFactors": {"fields": {"p": 0.3},
                              "equations": {"U": 0.7, "T": 0.7}},
        "function": {
            "Tout": {"type": "patchMean", "patches": ["xmax"],
                     "varName": "T", "scale": 1.0},
            "mdot": {"type": "massFlowRate", "patches": ["xmax"],
                     "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": {"U": UIN, "p": 101325.0, "T": 300.0, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def case():
    solver, inputs = channel()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, state, info


def test_rho_primal(case):
    solver, inputs, state, info = case
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    r = solver.residuals(state, inputs)
    # residuals consistent at the converged state (scaled by magnitudes)
    assert float(jnp.abs(r["p"]).max()) < 1e-4      # p ~ 1e5
    assert float(jnp.abs(r["U"]).max()) < 1e-4
    T = np.asarray(state["T"])
    assert T.min() >= 299.0 and T.max() <= 350.1
    rho = np.asarray(solver.rho_of(state, inputs))
    assert 0.9 < rho.min() < rho.max() < 1.3


def test_rho_adjoint_vs_fd(case):
    solver, inputs, state, info = case
    psi, ai = solver.run_adjoint("Tout", state, inputs)
    tot = solver.run_totals("Tout", state, inputs, psi)
    dTw = float(tot["bc"]["T"]["ymin"])

    def runJ(tw):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["T"]["ymin"] = jnp.asarray(tw, solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("Tout", st, inp))

    eps = 1e-3
    fd = (runJ(350.0 + eps) - runJ(350.0 - eps)) / (2 * eps)
    assert dTw == pytest.approx(fd, rel=1e-4), (dTw, fd)

    # forward-AD triangulation (reference: ADF build vs ADR build per
    # solver, testFuncs.py:34-46)
    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["bc"]["T"]["ymin"] = jnp.ones_like(inputs["bc"]["T"]["ymin"])
    dJ_fwd, _ = solver.forward_total_derivative(state, inputs, "Tout", dx)
    assert dTw == pytest.approx(float(dJ_fwd), rel=1e-6), (dTw, float(dJ_fwd))
