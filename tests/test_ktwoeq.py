"""kEpsilon / kOmega models: channel primal + adjoint vs FD
(reference DAkEpsilon / DAkOmega parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NU = 1e-4
KIN = 3.75e-3


def channel(model, extra_bc, extra_init, extra_norm):
    pts, topo = box_hex_mesh(16, 8, 1, (1.0, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    bcs = {
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
    }
    bcs.update(extra_bc)
    init = {"U": [1.0, 0.0, 0.0], "p": 0.0, "k": KIN}
    init.update(extra_init)
    ns = {"U": 1.0, "p": 0.5, "phi": 1.0, "k": KIN}
    ns.update(extra_norm)
    opts = {
        "solverName": "DASimpleFoam", "turbulenceModel": model,
        "transportProperties": {"nu": NU},
        "boundaryConditions": bcs, "initialFields": init,
        "primalMinResTol": 1e-11, "primalMaxIters": 4000,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {"drag": {"type": "force", "patches": ["ymin", "ymax"],
                              "directionMode": "fixedDirection",
                              "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-11, "gmresRestart": 300,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": ns,
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


EPS_BC = {
    "epsilon": {"xmin": {"type": "fixedValue", "value": 0.01},
                "xmax": {"type": "zeroGradient"},
                "ymin": {"type": "fixedValue", "value": 1.0},
                "ymax": {"type": "fixedValue", "value": 1.0}}}
OMEGA_BC = {
    "omega": {"xmin": {"type": "fixedValue", "value": 60.0},
              "xmax": {"type": "zeroGradient"},
              "ymin": {"type": "fixedValue", "value": 15360.0},
              "ymax": {"type": "fixedValue", "value": 15360.0}}}


@pytest.mark.parametrize("model,bc2,init2,norm2", [
    ("kEpsilon", EPS_BC, {"epsilon": 0.01}, {"epsilon": 0.01}),
    ("kOmega", OMEGA_BC, {"omega": 60.0}, {"omega": 60.0}),
])
def test_two_equation_adjoint(model, bc2, init2, norm2):
    solver, inputs = channel(model, bc2, init2, norm2)
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged), model
    psi, ai = solver.run_adjoint("drag", state, inputs)
    assert bool(ai.converged), model
    tot = solver.run_totals("drag", state, inputs, psi)
    dk = float(tot["bc"]["k"]["xmin"])

    def runJ(kv):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["k"]["xmin"] = jnp.asarray(kv, solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("drag", st, inp))

    eps = 1e-7
    fd = (runJ(KIN + eps) - runJ(KIN - eps)) / (2 * eps)
    assert dk == pytest.approx(fd, rel=1e-4), (model, dk, fd)
