"""linearUpwind deferred correction + unsteady compressible solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh, compute_geometry
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers import make_solver


def test_linear_upwind_exact_for_linear_field():
    """Convection residual of a linear field: linearUpwind reconstructs the
    face value exactly (second order), plain upwind does not."""
    pts, topo = box_hex_mesh(8, 6, 1, (1.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    geom = compute_geometry(jnp.asarray(pts), topo)
    a = jnp.asarray([1.3, -0.4, 0.0])
    psi = geom.cc @ a + 0.7
    ni = topo.n_internal
    psi_bex = geom.cf[ni:] @ a + 0.7
    U = jnp.tile(jnp.asarray([1.0, 0.5, 0.0]), (topo.n_cells, 1))
    U_b = jnp.tile(jnp.asarray([1.0, 0.5, 0.0]), (topo.n_boundary, 1))
    phi = fvc.flux(geom, topo, U, U_b)

    spec = {p.name: ({"type": "empty"} if p.kind == "empty"
                     else {"type": "fixedValue"}) for p in topo.patches}
    vals = {p.name: psi_bex[topo.patch_bslice(p.name)]
            for p in topo.patches if p.kind != "empty"}
    bco = bc.coeffs(spec, vals, topo, geom, psi, rank=0)

    # exact divergence of (U psi) for linear psi, constant U: U . grad(psi)
    exact = U @ a

    r_up = fvx.residual(fvm.div(geom, topo, phi, psi, bco, scheme="upwind"),
                        psi, geom, topo)
    r_lu = fvx.residual(fvm.div(geom, topo, phi, psi, bco,
                                scheme="linearUpwind"), psi, geom, topo)
    err_up = float(jnp.abs(r_up - exact).max())
    err_lu = float(jnp.abs(r_lu - exact).max())
    assert err_lu < 1e-10, err_lu          # exact for linear fields
    assert err_up > 1e-2                   # first-order error is visible


@pytest.fixture(scope="module")
def rho_pimple_case():
    pts, topo = box_hex_mesh(12, 6, 1, (1.0, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    UIN = 50.0
    opts = {
        "solverName": "DARhoPimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"mu": 1.8e-5, "Cp": 1004.5, "R": 287.0,
                                "Pr": 0.7},
        "deltaT": 2e-4, "endTime": 1e-3,   # 5 steps
        "pimple": {"nOuterCorrectors": 20, "nCorrectors": 3},
        # tight inner solves: loose tangent systems leak into the
        # jvp triangulation (see test_pimple_unsteady note)
        "primalLinearSolver": {"pMaxIters": 400, "pRelTol": 1e-12,
                               "uMaxIters": 200, "uRelTol": 1e-12,
                               "turbMaxIters": 100,
                               "turbRelTol": 1e-11},
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
                  "ymin": {"type": "fixedValue", "value": 330.0},
                  "ymax": {"type": "fixedValue", "value": 330.0}},
        },
        "initialFields": {"U": [UIN, 0.0, 0.0], "p": 101325.0, "T": 300.0},
        "primalVarBounds": {"UMin": -1000.0, "UMax": 1000.0,
                            "pMin": 20000.0, "pMax": 500000.0,
                            "TMin": 100.0, "TMax": 1000.0},
        "function": {"Tout": {"type": "patchMean", "patches": ["xmax"],
                              "varName": "T", "scale": 1.0,
                              "timeOp": "average",
                              "timeOpFracStart": 0.4}},
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 250,
                         "gmresMaxIters": 1500, "pcType": "none"},
        "normalizeStates": {"U": UIN, "p": 101325.0, "T": 300.0, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    hist_fn = jax.jit(solver.solve_primal_history)
    stT, hist = hist_fn(solver.init_state(), inputs)
    return solver, inputs, stT, hist, hist_fn


def test_rho_pimple_primal(rho_pimple_case):
    solver, inputs, stT, hist, _ = rho_pimple_case
    assert bool(solver.states_valid(stT))
    W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
    r = solver.residuals_unsteady(stT, W_old, W_old, inputs)
    # per-step residuals small relative to field scales
    assert float(jnp.abs(r["U"]).max()) < 50.0       # |U|~50, accel scale
    assert float(jnp.abs(r["phi"]).max()) < 1e-3
    T = np.asarray(stT["T"])
    assert 299.0 <= T.min() and T.max() <= 331.0


def test_rho_pimple_unsteady_adjoint_vs_fd(rho_pimple_case):
    solver, inputs, stT, hist, hist_fn = rho_pimple_case
    adj = jax.jit(lambda h, i: solver.solve_unsteady_adjoint(h, i, "Tout"))
    tot, resids = adj(hist, inputs)
    dTw = float(tot["bc"]["T"]["ymin"])

    def runJ(tw):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["T"]["ymin"] = jnp.asarray(tw, solver.dtype)
        _, h = hist_fn(solver.init_state(), inp)
        return float(solver.eval_function_history("Tout", h, inp)[0])

    eps = 1e-3
    fd = (runJ(330.0 + eps) - runJ(330.0 - eps)) / (2 * eps)
    # agreement is limited by per-step PIMPLE convergence (the adjoint
    # assumes R^n = 0 exactly); 12% at 4 outers -> 0.6% at 20 outers
    assert dTw == pytest.approx(fd, rel=1e-2), (dTw, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46): jvp of the
    # compressible time loop — exact twin of the FD above, so it shares
    # the per-step-convergence limit vs the adjoint but not FD noise
    def J_of_tw(tw):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["T"]["ymin"] = tw
        _, h = solver.solve_primal_history(solver.init_state(), inp)
        return solver.eval_function_history("Tout", h, inp)[0]

    _, dJ_fwd = jax.jvp(J_of_tw, (inputs["bc"]["T"]["ymin"],),
                        (jnp.ones_like(inputs["bc"]["T"]["ymin"]),))
    assert dTw == pytest.approx(float(dJ_fwd), rel=1e-2), (dTw,
                                                           float(dJ_fwd))


def test_linear_upwind_channel_adjoint_vs_fd():
    """End-to-end adjoint consistency with the 2nd-order scheme active
    (deferred correction differentiates cleanly through the upwind switch
    and gradient reconstruction)."""
    pts, topo = box_hex_mesh(12, 6, 1, (1.0, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam", "turbulenceModel": "None",
        "divSchemes": {"div(phi,U)": "linearUpwind"},
        "transportProperties": {"nu": 1e-3},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "fixedValue", "value": zero}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 1e-11, "primalMaxIters": 1500,
        "relaxationFactors": {"fields": {"p": 0.2}, "equations": {"U": 0.5}},
        "function": {"drag": {"type": "force", "patches": ["ymin", "ymax"],
                              "directionMode": "fixedDirection",
                              "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 2000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    st, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    psi, ai = solver.run_adjoint("drag", st, inputs)
    tot = solver.run_totals("drag", st, inputs, psi)
    dux = float(tot["bc"]["U"]["xmin"][0])

    def runJ(u):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["U"]["xmin"] = jnp.asarray([u, 0.0, 0.0], solver.dtype)
        s2, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("drag", s2, inp))

    eps = 1e-6
    fd = (runJ(1 + eps) - runJ(1 - eps)) / (2 * eps)
    assert dux == pytest.approx(fd, rel=1e-5), (dux, fd)
