"""North-star case: NACA0012 O-mesh, SIMPLE+SA, drag adjoint incl. shape
(volCoord) derivatives — the reference's flagship configuration
(BASELINE.json: NACA0012 SA-RANS drag adjoint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import compute_geometry
from dafoam_tpu.mesh.airfoil import omesh_naca0012
from dafoam_tpu.mesh.check import check_mesh
from dafoam_tpu.solvers import make_solver

NU = 1e-3  # Re=1000: resolved first cell (wall functions land in round 2)


def naca_case():
    pts, topo = omesh_naca0012(n_wrap=48, n_radial=16, radius=15.0,
                               first_cell=4e-3)
    uinf = [1.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "SpalartAllmaras",
        "transportProperties": {"nu": NU},
        "boundaryConditions": {
            "U": {"far": {"type": "inletOutlet", "value": uinf},
                  "wing": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {"far": {"type": "fixedValue", "value": 0.0},
                  "wing": {"type": "zeroGradient"}},
            "nuTilda": {"far": {"type": "inletOutlet", "value": 3 * NU},
                        "wing": {"type": "fixedValue", "value": 0.0}},
        },
        "initialFields": {"U": uinf, "p": 0.0, "nuTilda": 3 * NU},
        "primalMinResTol": 1e-10,
        "primalMaxIters": 1500,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "primalLinearSolver": {"pMaxIters": 200, "pRelTol": 0.02,
                               "uMaxIters": 50, "uRelTol": 0.05,
                               "turbMaxIters": 50, "turbRelTol": 0.05},
        "function": {
            "CD": {"type": "force", "patches": ["wing"],
                   "directionMode": "fixedDirection",
                   "direction": [1.0, 0.0, 0.0], "scale": 1.0},
            "CL": {"type": "force", "patches": ["wing"],
                   "directionMode": "fixedDirection",
                   "direction": [0.0, 1.0, 0.0], "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-9, "gmresRestart": 400,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * NU},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs(), pts, topo


@pytest.fixture(scope="module")
def case():
    solver, inputs, pts, topo = naca_case()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, pts, topo, state, info


def test_omesh_quality():
    pts, topo = omesh_naca0012(48, 16, 15.0, 4e-3)
    geom = compute_geometry(jnp.asarray(pts), topo)
    ok, rep = check_mesh(geom, topo,
                         {"maxAspectRatio": 1000.0, "maxNonOrth": 80.0,
                          "maxSkewness": 4.0,
                          "maxIncorrectlyOrientedFaces": 0})
    assert ok, rep
    # closed domain: total volume ~ pi R^2 * span (64-gon deficit small)
    assert float(geom.vol.sum()) == pytest.approx(np.pi * 15.0 ** 2 * 0.1,
                                                  rel=2e-2)


def test_naca_primal(case):
    solver, inputs, pts, topo, state, info = case
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    CL = float(solver.run_function("CL", state, inputs))
    CD = float(solver.run_function("CD", state, inputs))
    assert abs(CL) < 1e-10          # symmetric airfoil at AoA=0
    assert 0.0 < CD < 1.0


def test_naca_drag_adjoint_shape_derivative(case):
    """dCD/d(mesh point) — the volCoord path of the north star."""
    solver, inputs, pts, topo, state, info = case
    psi, ai = solver.run_adjoint("CD", state, inputs)
    assert float(ai.resid) < 1e-8 * 1e3
    tot = solver.run_totals("CD", state, inputs, psi)
    g = np.asarray(tot["points"])
    assert np.isfinite(g).all()

    # FD on one airfoil-surface point (y-displacement of an upper-surface
    # point) through the WHOLE pipeline
    surf_pts = np.where(np.isclose(pts[:, 2], 0.0)
                        & (np.hypot(pts[:, 0] - 0.5, pts[:, 1]) < 0.7))[0]
    pt = int(surf_pts[10])
    comp = 1

    def runJ(shift):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["points"] = inputs["points"].at[pt, comp].add(shift)
        st, pi = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("CD", st, inp))

    eps = 1e-6
    fd = (runJ(eps) - runJ(-eps)) / (2 * eps)
    assert g[pt, comp] == pytest.approx(fd, rel=2e-4), (g[pt, comp], fd)
