"""Spalding wall functions: high-Re channel (y+ >> 1) primal + adjoint
(reference nutUSpaldingWallFunctionDF parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.models.wallfunctions import spalding_utau
from dafoam_tpu.solvers import make_solver

NU = 1e-6


def test_spalding_law_limits():
    # viscous sublayer: u+ = y+  =>  utau = sqrt(nu U / y)
    nu = 1e-6
    y = jnp.asarray([1e-6])
    U = jnp.asarray([1e-3])
    ut = spalding_utau(U, y, nu)
    assert float(ut[0]) == pytest.approx(float(jnp.sqrt(nu * U[0] / y[0])),
                                         rel=1e-3)
    # log layer: u+ = ln(E y+)/kappa
    y = jnp.asarray([0.01])
    U = jnp.asarray([1.0])
    ut = float(spalding_utau(U, y, nu)[0])
    yplus = y[0] * ut / nu
    uplus = U[0] / ut
    assert uplus == pytest.approx(float(jnp.log(9.8 * yplus) / 0.41),
                                  rel=2e-2)


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
            "nuTilda": {"xmin": {"type": "fixedValue", "value": 50 * NU},
                        "xmax": {"type": "zeroGradient"},
                        "ymin": {"type": "zeroGradient"},
                        "ymax": {"type": "zeroGradient"}},
            "nut": {"ymin": {"type": "nutUSpaldingWallFunction"},
                    "ymax": {"type": "nutUSpaldingWallFunction"}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0,
                          "nuTilda": 50 * NU},
        "primalMinResTol": 1e-9,
        "primalMaxIters": 2000,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {"drag": {"type": "force", "patches": ["ymin", "ymax"],
                              "directionMode": "fixedDirection",
                              "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 50 * NU},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


def test_wall_function_channel_adjoint():
    solver, inputs = channel()
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    Cf = float(solver.run_function("drag", state, inputs)) / (0.5 * 0.02)
    assert 5e-4 < Cf < 1e-2  # turbulent-range skin friction
    psi, ai = solver.run_adjoint("drag", state, inputs)
    tot = solver.run_totals("drag", state, inputs, psi)
    dux = float(tot["bc"]["U"]["xmin"][0])

    def runJ(u):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["U"]["xmin"] = jnp.asarray([u, 0.0, 0.0], solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("drag", st, inp))

    eps = 1e-5
    fd = (runJ(1 + eps) - runJ(1 - eps)) / (2 * eps)
    assert dux == pytest.approx(fd, rel=1e-4), (dux, fd)
