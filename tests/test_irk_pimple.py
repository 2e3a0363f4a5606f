"""DAIrkPimpleFoam: Radau IIA(2,3) collocation primal + coupled-stage
unsteady adjoint vs FD (reference
src/adjoint/DASolver/DAIrkPimpleFoam/DAIrkPimpleFoam.C Radau23 scheme)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver


def cavity(solver_name, dt, end, n_outer=6, sweeps=5, lin=None, ncorr=2):
    n = 8
    pts, topo = box_hex_mesh(n, n, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": solver_name,
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.01},
        "deltaT": dt, "endTime": end,
        "pimple": {"nOuterCorrectors": n_outer, "nCorrectors": ncorr},
        "irk": {"maxSweeps": sweeps},
        "boundaryConditions": {
            "U": {"ymax": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "xmin": {"type": "fixedValue", "value": zero},
                  "xmax": {"type": "fixedValue", "value": zero}},
            "p": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": zero, "p": 0.0},
        "function": {
            "lidF": {"type": "force", "patches": ["ymax"],
                     "directionMode": "fixedDirection",
                     "direction": [1.0, 0.0, 0.0], "scale": 1.0,
                     "timeOp": "final"},
        },
        "adjEqnOption": {"gmresRelTol": 1e-12, "gmresRestart": 300,
                         "gmresMaxIters": 3000, "pcType": "segregated",
                         "pcInnerIters": 15},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    if lin is not None:
        opts["primalLinearSolver"] = lin
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def case():
    # sweeps=10: the adjoint linearizes R=0 — FD agreement is limited by
    # how tightly the primal stage sweeps converge each step
    solver, inputs = cavity("DAIrkPimpleFoam", 0.02, 0.1, sweeps=10,
                            lin={"pMaxIters": 400, "pRelTol": 1e-12,
                                 "uMaxIters": 200, "uRelTol": 1e-12})
    hist_fn = jax.jit(solver.solve_primal_history)
    stT, hist = hist_fn(solver.init_state(), inputs)
    return solver, inputs, stT, hist, hist_fn


def test_irk_primal_residual(case):
    """Both collocation rows of the final step are converged."""
    solver, inputs, stT, hist, _ = case
    assert bool(solver.states_valid(stT))
    W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
    r = solver.residuals_unsteady(stT, W_old, W_old, inputs)
    for k in ("U", "U1", "p", "p1"):
        assert float(jnp.abs(r[k]).max()) < 5e-3, k


def test_radau23_coefficients_third_order():
    """The D-matrix algebra used by the solver, applied to dy/dt = -y
    (y(0)=1), converges at 3rd order — verifies the Radau IIA(2,3)
    coefficients independent of the PDE machinery."""
    from dafoam_tpu.solvers.irk_pimple import DAIrkPimpleFoam
    d10, d11, d12 = DAIrkPimpleFoam.D1
    d20, d21, d22 = DAIrkPimpleFoam.D2

    def step(y, dt):
        # solve the 2x2 collocation system for lam = -1:
        #   (d11/dt + 1) y1 + (d12/dt) y2 = -(d10/dt) y
        #   (d21/dt) y1 + (d22/dt + 1) y2 = -(d20/dt) y
        A = np.array([[d11 / dt + 1.0, d12 / dt],
                      [d21 / dt, d22 / dt + 1.0]])
        b = np.array([-d10 / dt * y, -d20 / dt * y])
        return np.linalg.solve(A, b)[1]

    errs = []
    for nsteps in (4, 8, 16):
        dt, y = 1.0 / nsteps, 1.0
        for _ in range(nsteps):
            y = step(y, dt)
        errs.append(abs(y - np.exp(-1.0)))
    r1 = errs[0] / errs[1]
    r2 = errs[1] / errs[2]
    assert r1 > 6.5 and r2 > 6.5, errs   # 3rd order: ratio ~8


def test_irk_temporal_accuracy_beats_euler():
    """At equal dt, Radau23 is closer to a tight small-dt reference than
    Euler. (The lid-driven impulsive start limits BOTH schemes to O(sqrt(dt))
    global error — the clean 3rd-order check is the ODE test above.)"""
    tight = {"pMaxIters": 200, "pRelTol": 1e-10, "uMaxIters": 100,
             "uRelTol": 1e-10, "turbMaxIters": 50, "turbRelTol": 1e-8}
    s_ref, i_ref = cavity("DAIrkPimpleFoam", 0.0025, 0.04, sweeps=20,
                          lin=tight, ncorr=3)
    stR, _ = jax.jit(s_ref.solve_primal_history)(s_ref.init_state(), i_ref)
    Uref = np.asarray(stR["U"])

    s_ir, i_ir = cavity("DAIrkPimpleFoam", 0.02, 0.04, sweeps=20, lin=tight,
                        ncorr=3)
    stI, _ = jax.jit(s_ir.solve_primal_history)(s_ir.init_state(), i_ir)
    err_irk = np.abs(np.asarray(stI["U"]) - Uref).max()

    s_eu, i_eu = cavity("DAPimpleFoam", 0.02, 0.04, n_outer=14, lin=tight,
                        ncorr=3)
    stE, _ = jax.jit(s_eu.solve_primal_history)(s_eu.init_state(), i_eu)
    err_eul = np.abs(np.asarray(stE["U"]) - Uref).max()

    assert err_irk < 0.75 * err_eul, (err_irk, err_eul)


def test_irk_unsteady_adjoint_vs_fd(case):
    solver, inputs, stT, hist, hist_fn = case
    adj = jax.jit(lambda h, i: solver.solve_unsteady_adjoint(h, i, "lidF"))
    tot, resids = adj(hist, inputs)
    assert np.asarray(resids).max() < 1e-9
    dnu = float(tot["params"]["nu"])

    def runJ(nu):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["nu"] = jnp.asarray(nu, solver.dtype)
        _, h = hist_fn(solver.init_state(), inp)
        return float(solver.eval_function_history("lidF", h, inp)[0])

    eps = 1e-6
    fd = (runJ(0.01 + eps) - runJ(0.01 - eps)) / (2 * eps)
    assert dnu == pytest.approx(fd, rel=2e-5), (dnu, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46): jvp of the
    # Radau IIA time loop
    def J_of_nu(nu):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["nu"] = nu
        _, h = solver.solve_primal_history(solver.init_state(), inp)
        return solver.eval_function_history("lidF", h, inp)[0]

    _, dJ_fwd = jax.jvp(J_of_nu, (inputs["params"]["nu"],),
                        (jnp.ones((), solver.dtype),))
    # adjoint linearizes the converged stage equations; the jvp
    # differentiates the computed sweeps — agreement is limited by
    # per-step stage-sweep convergence, not AD plumbing. Convergence-
    # scaled bound (tests/convbar.py), capped at the historical 1e-5.
    from convbar import last_step_residual, rel_bar
    res = last_step_residual(solver, stT, hist, inputs)
    bar = rel_bar(res, solver.dtype, cap=1e-5)
    assert dnu == pytest.approx(float(dJ_fwd), rel=bar), \
        (dnu, float(dJ_fwd), res, bar)


def test_irk_adjoint_pc_consistency(case):
    """Unpreconditioned GMRES (shallower convergence) agrees with the
    stage-block segregated PC totals."""
    solver, inputs, stT, hist, _ = case
    tot0, _ = solver.solve_unsteady_adjoint(hist, inputs, "lidF")
    solver.option.set("adjEqnOption.pcType", "none")
    try:
        tot1, resids = solver.solve_unsteady_adjoint(hist, inputs, "lidF")
    finally:
        solver.option.set("adjEqnOption.pcType", "segregated")
    assert np.asarray(resids).max() < 1e-7
    assert float(tot1["params"]["nu"]) == pytest.approx(
        float(tot0["params"]["nu"]), rel=1e-4)
