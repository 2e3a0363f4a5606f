"""DAInterFoam: VoF dam break — MULES boundedness/conservation and the
alpha-chain unsteady adjoint vs FD (reference
src/adjoint/DASolver/DAInterFoam + DAMisc/MULESDF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

RHO1, RHO2 = 1000.0, 1.0
DT = 0.002
NSTEP = 10


def dam_break():
    nx, ny = 12, 8
    pts, topo = box_hex_mesh(nx, ny, 1, (0.6, 0.4, 0.02),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DAInterFoam",
        "transportProperties": {"rho1": RHO1, "rho2": RHO2,
                                "nu1": 1e-6, "nu2": 1.48e-5,
                                "cAlpha": 1.0},
        "g": [0.0, -9.81, 0.0],
        "deltaT": DT, "endTime": DT * NSTEP,
        "pimple": {"nOuterCorrectors": 5, "nCorrectors": 3},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": zero},
                  "xmax": {"type": "fixedValue", "value": zero},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "zeroGradient"}},
            "p_rgh": {"xmin": {"type": "zeroGradient"},
                      "xmax": {"type": "zeroGradient"},
                      "ymin": {"type": "zeroGradient"},
                      "ymax": {"type": "fixedValue", "value": 0.0}},
            "alpha": {"xmin": {"type": "zeroGradient"},
                      "xmax": {"type": "zeroGradient"},
                      "ymin": {"type": "zeroGradient"},
                      "ymax": {"type": "fixedValue", "value": 0.0}},
        },
        "initialFields": {"U": zero, "p_rgh": 0.0, "alpha": 0.0},
        "primalLinearSolver": {"pMaxIters": 400, "pRelTol": 1e-12,
                               "uMaxIters": 200, "uRelTol": 1e-12,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "function": {
            "pRight": {"type": "patchMean", "patches": ["xmax"],
                       "varName": "p_rgh", "scale": 1.0,
                       "timeOp": "average"},
        },
        "adjEqnOption": {"gmresRelTol": 1e-13, "gmresRestart": 500,
                         "gmresMaxIters": 6000, "pcType": "none"},
        "normalizeStates": {"U": 1.0, "p_rgh": 100.0, "phi": 1.0,
                            "alpha": 1.0},
        "normalizeResiduals": ["URes", "p_rghRes", "phiRes", "alphaRes"],
    }
    solver = make_solver(opts, topo, pts)
    # water column in the left third, bottom half
    from dafoam_tpu.mesh.geometry import compute_geometry
    geom = compute_geometry(solver.points, topo)
    cc = np.asarray(geom.cc)
    col = ((cc[:, 0] < 0.2) & (cc[:, 1] < 0.2)).astype(float)
    st0 = solver.init_state()
    st0["alpha"] = jnp.asarray(col, solver.dtype)
    return solver, solver.make_inputs(), st0, topo


@pytest.fixture(scope="module")
def case():
    solver, inputs, st0, topo = dam_break()
    hist_fn = jax.jit(solver.solve_primal_history)
    stT, hist = hist_fn(st0, inputs)
    return solver, inputs, st0, stT, hist, hist_fn, topo


def test_dam_break_bounded_and_conservative(case):
    solver, inputs, st0, stT, hist, hist_fn, topo = case
    assert bool(solver.states_valid(stT))
    a = np.asarray(stT["alpha"])
    assert a.min() >= -1e-9 and a.max() <= 1.0 + 1e-9   # MULES bounds
    geom = solver.geometry(inputs)
    vol = np.asarray(geom.vol)
    m0 = float((np.asarray(st0["alpha"]) * vol).sum())
    mT = float((a * vol).sum())
    # closed box (no water reaches the open top in 10 steps)
    assert mT == pytest.approx(m0, rel=1e-10)
    # the column collapses: water centre of mass moves right and down
    cc = np.asarray(geom.cc)
    x0 = (np.asarray(st0["alpha"]) * vol * cc[:, 0]).sum() / m0
    xT = (a * vol * cc[:, 0]).sum() / mT
    y0 = (np.asarray(st0["alpha"]) * vol * cc[:, 1]).sum() / m0
    yT = (a * vol * cc[:, 1]).sum() / mT
    assert xT > x0 + 1e-5
    assert yT < y0 - 1e-6


def test_dam_break_residuals_consistent(case):
    solver, inputs, st0, stT, hist, hist_fn, topo = case
    W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
    r = solver.residuals_unsteady(stT, W_old, W_old, inputs)
    # alpha row is the explicit update: exactly zero at the trajectory
    assert float(jnp.abs(r["alpha"]).max()) < 1e-12
    assert float(jnp.abs(r["phi"]).max()) < 2e-6
    assert float(jnp.abs(r["p_rgh"]).max()) < 2e-4


def test_dam_break_adjoint_vs_fd(case):
    """dJ/d(rho1) through the VoF chain (alpha explicit rows + mixture
    momentum/pressure) vs FD of the whole unsteady run."""
    solver, inputs, st0, stT, hist, hist_fn, topo = case
    tot, resids = solver.solve_unsteady_adjoint(hist, inputs, "pRight")
    assert np.asarray(resids).max() < 1e-9
    dr = float(tot["params"]["rho1"])

    def runJ(rho1):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["rho1"] = jnp.asarray(rho1, solver.dtype)
        _, h = hist_fn(st0, inp)
        J, _ = solver.eval_function_history("pRight", h, inp)
        return float(J)

    eps = 1e-3
    fd = (runJ(RHO1 + eps) - runJ(RHO1 - eps)) / (2 * eps)
    assert abs(dr) > 1e-12
    assert dr == pytest.approx(fd, rel=2e-4), (dr, fd)
    # triangulate with forward AD through the unrolled primal (the
    # reference's ADF-style oracle, consistent at FCT limiter kinks)
    def J_of(rho1):
        inp = dict(inputs)
        inp["params"] = dict(inputs["params"], rho1=rho1)
        _, h = hist_fn(st0, inp)
        J, _ = solver.eval_function_history("pRight", h, inp)
        return J
    _, dj_fwd = jax.jvp(J_of, (jnp.asarray(RHO1, solver.dtype),),
                        (jnp.asarray(1.0, solver.dtype),))
    # per-step-convergence-limited: convergence-scaled bound
    # (tests/convbar.py), capped at the historical 2e-4
    from convbar import last_step_residual, rel_bar
    res = last_step_residual(solver, stT, hist, inputs)
    bar = rel_bar(res, solver.dtype, cap=2e-4)
    assert dr == pytest.approx(float(dj_fwd), rel=bar), \
        (dr, float(dj_fwd), res, bar)
