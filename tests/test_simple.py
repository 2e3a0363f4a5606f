"""DASimpleFoam: lid-driven cavity primal + adjoint totals vs FD.

The reference's oracle is adjoint vs forward-AD cross-validation under
golden tolerances (SURVEY.md §4); here the laminar cavity exercises the
full SIMPLE machinery: momentum predictor, pressure projection with
reference cell, flux state, relaxation, adjustPhi."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

N = 10


def cavity(nu=0.01, maxiters=500):
    pts, topo = box_hex_mesh(N, N, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": nu},
        "boundaryConditions": {
            "U": {"ymax": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "xmin": {"type": "fixedValue", "value": zero},
                  "xmax": {"type": "fixedValue", "value": zero}},
            "p": {n: {"type": "zeroGradient"}
                  for n in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": zero, "p": 0.0},
        "primalMinResTol": 1e-11,
        "primalMaxIters": maxiters,
        "relaxationFactors": {"fields": {"p": 0.3}, "equations": {"U": 0.7}},
        "function": {
            "lidForce": {"type": "force", "patches": ["ymax"],
                         "directionMode": "fixedDirection",
                         "direction": [1.0, 0.0, 0.0], "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 150,
                         "gmresMaxIters": 3000},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs(), topo


@pytest.fixture(scope="module")
def converged():
    solver, inputs, topo = cavity()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, topo, state, info


def test_cavity_primal(converged):
    solver, inputs, topo, state, info = converged
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    assert not bool(info.failed)
    # mass conservation
    from dafoam_tpu.ops import fvc
    geom = solver.geometry(inputs)
    divphi = np.asarray(fvc.div_surface(geom, topo, state["phi"]))
    assert np.abs(divphi).max() < 1e-9
    # residual-function consistency at the converged state
    r = solver.residuals(state, inputs)
    assert np.abs(np.asarray(r["U"])).max() < 1e-7
    assert np.abs(np.asarray(r["p"])).max() < 1e-8
    assert np.abs(np.asarray(r["phi"])).max() < 1e-12
    # physicality
    U = np.asarray(state["U"])
    assert U[:, 0].max() <= 1.0 + 1e-8
    assert np.abs(U).max() == pytest.approx(U[:, 0].max())


def test_cavity_adjoint_totals_vs_fd(converged):
    solver, inputs, topo, state, info = converged
    psi, ai = solver.run_adjoint("lidForce", state, inputs)
    # GMRES may exhaust maxIters before the tight reltol; require a deep
    # absolute drop instead
    assert float(ai.resid) < 1e-9 * max(1.0, float(ai.resid0) * 1e3)
    tot = solver.run_totals("lidForce", state, inputs, psi)
    dnu = float(tot["params"]["nu"])
    dlid = float(tot["bc"]["U"]["ymax"][0])

    def runJ(nu=0.01, ul=1.0):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["nu"] = jnp.asarray(nu, solver.dtype)
        inp["bc"]["U"]["ymax"] = jnp.asarray([ul, 0.0, 0.0], solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("lidForce", st, inp))

    eps = 1e-6
    fd_nu = (runJ(nu=0.01 + eps) - runJ(nu=0.01 - eps)) / (2 * eps)
    fd_ul = (runJ(ul=1.0 + eps) - runJ(ul=1.0 - eps)) / (2 * eps)
    assert dnu == pytest.approx(fd_nu, rel=1e-6)
    assert dlid == pytest.approx(fd_ul, rel=1e-6)


def test_simplec_consistent_primal_and_adjoint():
    """SIMPLEC (simple.consistent, reference DAResidualSimpleFoam.C rAtU
    branch): converges with p relaxation 1.0 and keeps adjoint-FD parity."""
    solver, inputs, topo = cavity()
    solver.option.set("simple.consistent", True)
    solver.option.set("relaxationFactors.fields.p", 1.0)
    solver.option.set("relaxationFactors.equations.U", 0.9)
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    # residual-function consistency at the converged state
    r = solver.residuals(state, inputs)
    assert np.abs(np.asarray(r["U"])).max() < 1e-7
    assert np.abs(np.asarray(r["phi"])).max() < 1e-11
    psi, ai = solver.run_adjoint("lidForce", state, inputs)
    tot = solver.run_totals("lidForce", state, inputs, psi)
    dnu = float(tot["params"]["nu"])

    def runJ(nu):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["nu"] = jnp.asarray(nu, solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("lidForce", st, inp))

    eps = 1e-6
    fd = (runJ(0.01 + eps) - runJ(0.01 - eps)) / (2 * eps)
    assert dnu == pytest.approx(fd, rel=1e-5)


def test_func_std_convergence_exit():
    """Trailing-window function std/slope exit (reference DASolver::loop +
    calcFuncStd/calcFuncSlope, DASolver.C:156-316): with an unreachable
    residual tolerance the loop exits early once lidForce flattens."""
    solver, inputs, topo = cavity()
    solver.option.set("primalMinResTol", 1e-300)
    solver.option.set("primalFuncStdTol",
                      {"stdTol": 1e-7, "slopeTol": 1e-7,
                       "funcNames": ["lidForce"], "nStepsFrac": 0.2})
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    assert not bool(info.failed)
    # exited before primalMaxIters but not on a degenerate 1-sample window
    assert 5 < int(info.iters) < 500


def test_primal_min_res_tol_diff_failure():
    """checkPrimalFailure parity (reference DASolver.C:2721): residual
    misses tol*primalMinResTolDiff -> failed; within the slack -> not."""
    solver, inputs, topo = cavity(maxiters=30)
    solver.option.set("primalMinResTol", 1e-12)
    solver.option.set("primalMinResTolDiff", 1.0)
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert not bool(info.converged)
    assert bool(info.failed)
    # huge slack: same run is a non-failure
    solver2, inputs2, _ = cavity(maxiters=30)
    solver2.option.set("primalMinResTol", 1e-12)
    solver2.option.set("primalMinResTolDiff", 1e30)
    _, info2 = solver2.run_primal(solver2.init_state(), inputs2)
    assert not bool(info2.failed)
