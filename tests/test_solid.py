"""DASolidDisplacementFoam: cantilever-style plate, vonMisesStressKS
adjoint vs FD (reference runRegTests_DASolidDisplacementFoam.py role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver


def plate():
    pts, topo = box_hex_mesh(12, 4, 1, (1.0, 0.2, 0.05),
                             kinds={"zmin": "empty", "zmax": "empty"})
    opts = {
        "solverName": "DASolidDisplacementFoam",
        "transportProperties": {"E": 2e11, "nuPoisson": 0.3,
                                "rhoSolid": 7854.0},
        "boundaryConditions": {
            "D": {"xmin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "fixedGradient",
                           "value": [0.0, -1e-4, 0.0]}},
        },
        "initialFields": {"D": [0.0, 0.0, 0.0]},
        "primalMinResTol": 1e-10,
        "primalMaxIters": 400,
        "relaxationFactors": {"fields": {"D": 0.9}, "equations": {}},
        "function": {
            "vms": {"type": "vonMisesStressKS", "coeffKS": 2e-7,
                    "scale": 1.0},
            "tipD": {"type": "patchMean", "patches": ["xmax"],
                     "varName": "D", "component": 1, "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 200,
                         "gmresMaxIters": 1500, "pcType": "none"},
        "normalizeStates": {"D": 1e-5},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def case():
    solver, inputs = plate()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, state, info


def test_solid_primal(case):
    solver, inputs, state, info = case
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    D = np.asarray(state["D"])
    assert D[:, 1].min() < 0  # plate bends downward under shear load
    vm = np.asarray(solver.aux_fields(state, inputs,
                                      solver.geometry(inputs))["vonMises"])
    assert vm.max() > 0 and np.isfinite(vm).all()


def test_solid_adjoint_vs_fd(case):
    solver, inputs, state, info = case
    psi, ai = solver.run_adjoint("tipD", state, inputs)
    tot = solver.run_totals("tipD", state, inputs, psi)
    dE = float(tot["params"]["E"])

    def runJ(E):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["E"] = jnp.asarray(E, solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("tipD", st, inp))

    eps = 2e3  # relative 1e-8 of E
    fd = (runJ(2e11 + eps) - runJ(2e11 - eps)) / (2 * eps)
    assert dE == pytest.approx(fd, rel=1e-4), (dE, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46)
    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["params"]["E"] = jnp.ones((), solver.dtype)
    dJ_fwd, _ = solver.forward_total_derivative(state, inputs, "tipD", dx)
    assert dE == pytest.approx(float(dJ_fwd), rel=1e-6), (dE, float(dJ_fwd))
