"""Aerostructural FSI: channel flow over a flexible plate — coupled primal
+ monolithic coupled adjoint vs FD (reference runRegTests_AeroStruct role,
with the in-house solid solver instead of TACS)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.coupling import FSICoupling
from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NX = 10
E0 = 5e4
ZERO = [0.0, 0.0, 0.0]


def build():
    pts_f, topo_f = box_hex_mesh(NX, 5, 1, (1.0, 0.1, 0.01),
                                 kinds={"zmin": "empty", "zmax": "empty",
                                        "ymin": "wall", "ymax": "wall"})
    opts_f = {
        "solverName": "DASimpleFoam", "turbulenceModel": "None",
        "transportProperties": {"nu": 1e-3},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": ZERO},
                  "ymax": {"type": "fixedValue", "value": ZERO}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 1e-10, "primalMaxIters": 800,
        "relaxationFactors": {"fields": {"p": 0.2}, "equations": {"U": 0.5}},
        "function": {"drag": {"type": "force", "patches": ["ymin"],
                              "directionMode": "fixedDirection",
                              "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    fluid = make_solver(opts_f, topo_f, pts_f)

    pts_s, topo_s = box_hex_mesh(NX, 3, 1, (1.0, 0.02, 0.01),
                                 kinds={"zmin": "empty", "zmax": "empty"})
    pts_s = pts_s.copy()
    pts_s[:, 1] -= 0.02
    opts_s = {
        "solverName": "DASolidDisplacementFoam",
        "transportProperties": {"E": E0, "nuPoisson": 0.3,
                                "rhoSolid": 1000.0},
        "boundaryConditions": {
            "D": {"xmin": {"type": "fixedValue", "value": ZERO},
                  "xmax": {"type": "fixedValue", "value": ZERO},
                  "ymin": {"type": "fixedValue", "value": ZERO},
                  "ymax": {"type": "fixedGradient", "value": ZERO}},
        },
        "initialFields": {"D": ZERO},
        "primalMinResTol": 1e-9, "primalMaxIters": 300,
        "relaxationFactors": {"fields": {"D": 0.9}, "equations": {}},
        "function": {},
        "normalizeStates": {"D": 1e-4},
    }
    solid = make_solver(opts_s, topo_s, pts_s)
    return fluid, solid


@pytest.fixture(scope="module")
def case():
    fluid, solid = build()
    fsi = FSICoupling(fluid, solid, "ymin", "ymax")
    inf = fluid.make_inputs()
    ins = solid.make_inputs()
    sf, ss, infos = fsi.solve_primal(fluid.init_state(), solid.init_state(),
                                     inf, ins, n_outer=8)
    return fsi, fluid, solid, inf, ins, sf, ss, infos


def test_fsi_coupled_primal(case):
    fsi, fluid, solid, inf, ins, sf, ss, infos = case
    assert bool(infos[0].converged) and bool(infos[1].converged)
    # plate deflects under the flow load
    assert float(jnp.abs(ss["D"]).max()) > 1e-8
    # coupled residual ~ 0 at the converged pair
    r = fsi.residuals({"fluid": sf, "solid": ss}, inf, ins)
    for side, sub in r.items():
        for k, v in sub.items():
            assert float(jnp.abs(v).max()) < 1e-8, (side, k)


def test_fsi_coupled_adjoint_vs_fd(case):
    fsi, fluid, solid, inf, ins, sf, ss, infos = case
    tot_f, tot_s, ai = fsi.solve_adjoint(sf, ss, inf, ins, "fluid", "drag",
                                         max_iters=3000)
    dE = float(tot_s["params"]["E"])

    def runJ(E):
        ins2 = jax.tree_util.tree_map(lambda x: x, ins)
        ins2["params"]["E"] = jnp.asarray(E, solid.dtype)
        s_f, s_s, _ = fsi.solve_primal(fluid.init_state(),
                                       solid.init_state(), inf, ins2,
                                       n_outer=8)
        return float(fsi.eval_function({"fluid": s_f, "solid": s_s},
                                       inf, ins2, "fluid", "drag"))

    eps = 1.0
    fd = (runJ(E0 + eps) - runJ(E0 - eps)) / (2 * eps)
    assert dE == pytest.approx(fd, rel=5e-3), (dE, fd)
