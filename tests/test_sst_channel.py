"""kOmegaSST turbulent channel: primal + adjoint vs FD (reference
DAkOmegaSST parity; two model states in the adjoint vector)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NU = 1e-4
KIN = 3.75e-3
WIN = 60.0


def channel():
    pts, topo = box_hex_mesh(16, 8, 1, (1.0, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "kOmegaSST",
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
            "k": {"xmin": {"type": "fixedValue", "value": KIN},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": 1e-10},
                  "ymax": {"type": "fixedValue", "value": 1e-10}},
            "omega": {"xmin": {"type": "fixedValue", "value": WIN},
                      "xmax": {"type": "zeroGradient"},
                      "ymin": {"type": "fixedValue", "value": 15360.0},
                      "ymax": {"type": "fixedValue", "value": 15360.0}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0, "k": KIN,
                          "omega": WIN},
        "primalMinResTol": 1e-9,
        "primalMaxIters": 1500,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {
            "drag": {"type": "force", "patches": ["ymin", "ymax"],
                     "directionMode": "fixedDirection",
                     "direction": [1.0, 0.0, 0.0], "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0, "k": KIN,
                            "omega": WIN},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def case():
    solver, inputs = channel()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, state, info


def test_sst_primal(case):
    solver, inputs, state, info = case
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    k = np.asarray(state["k"])
    w = np.asarray(state["omega"])
    assert (k >= 0).all() and (w > 0).all()
    r = solver.residuals(state, inputs)
    for name in ("U", "p", "phi", "k"):
        assert np.abs(np.asarray(r[name])).max() < 1e-6, name


def test_sst_adjoint_vs_fd(case):
    solver, inputs, state, info = case
    psi, ai = solver.run_adjoint("drag", state, inputs)
    assert bool(ai.converged), (int(ai.iters), float(ai.resid))
    tot = solver.run_totals("drag", state, inputs, psi)
    dk = float(tot["bc"]["k"]["xmin"])

    def runJ(kv):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["k"]["xmin"] = jnp.asarray(kv, solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("drag", st, inp))

    eps = 1e-5
    fd = (runJ(KIN + eps) - runJ(KIN - eps)) / (2 * eps)
    assert dk == pytest.approx(fd, rel=2e-3), (dk, fd)
