"""MRF rotating zone (reference MRFZoneDF / DATurboFoam foundation):
rotating-wall cavity, differentiable rotation speed dJ/dOmega vs FD —
the exact capability the reference forked MRFZone for (runtime-mutable
omega, src/adjoint/DAMisc/MRFDF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

OMEGA = 10.0
L = 0.1


def rotating_cavity():
    n = 10
    pts, topo = box_hex_mesh(n, n, 1, (L, L, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    pts = pts.copy()
    pts[:, 0] -= L / 2
    pts[:, 1] -= L / 2
    opts = {
        "solverName": "DASimpleFoam", "turbulenceModel": "None",
        "transportProperties": {"nu": 1e-4},
        "MRF": {"active": True, "origin": [0.0, 0.0, 0.0],
                "axis": [0.0, 0.0, 1.0], "omega": OMEGA, "cellZone": "all",
                "rotatingPatches": ["xmin", "xmax", "ymin", "ymax"]},
        "boundaryConditions": {
            "U": {p: {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}
                  for p in ("xmin", "xmax", "ymin", "ymax")},
            "p": {p: {"type": "zeroGradient"}
                  for p in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": [0.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 1e-10, "primalMaxIters": 4000,
        # explicit Coriolis needs strong under-relaxation
        "relaxationFactors": {"fields": {"p": 0.05},
                              "equations": {"U": 0.15}},
        "function": {"wallFx": {"type": "force", "patches": ["ymax"],
                                "directionMode": "fixedDirection",
                                "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    inputs["params"]["MRF"] = {"omega": jnp.asarray(OMEGA, solver.dtype)}
    return solver, inputs


def test_mrf_rotation_adjoint_vs_fd():
    solver, inputs = rotating_cavity()
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    # bulk rotation in the right direction (positive z vorticity)
    geom = solver.geometry(inputs)
    cc = np.asarray(geom.cc)
    U = np.asarray(state["U"])
    vort_sense = np.mean(-U[:, 0] * cc[:, 1] + U[:, 1] * cc[:, 0])
    assert vort_sense > 0

    psi, ai = solver.run_adjoint("wallFx", state, inputs)
    tot = solver.run_totals("wallFx", state, inputs, psi)
    dom = float(tot["params"]["MRF"]["omega"])

    def runJ(om):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["MRF"] = {"omega": jnp.asarray(om, solver.dtype)}
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("wallFx", st, inp))

    eps = 1e-5
    fd = (runJ(OMEGA + eps) - runJ(OMEGA - eps)) / (2 * eps)
    assert dom == pytest.approx(fd, rel=1e-4), (dom, fd)
