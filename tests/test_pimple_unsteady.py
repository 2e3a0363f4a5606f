"""DAPimpleFoam: unsteady primal (lax.scan) + time-accurate adjoint
(reverse scan) vs FD — the reference's unsteady machinery (SURVEY.md §3.5),
with DATimeOp 'average' reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver


def cavity_unsteady():
    n = 8
    pts, topo = box_hex_mesh(n, n, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DAPimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.01},
        "deltaT": 0.02, "endTime": 0.1,
        "pimple": {"nOuterCorrectors": 12, "nCorrectors": 2},
        "boundaryConditions": {
            "U": {"ymax": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "xmin": {"type": "fixedValue", "value": zero},
                  "xmax": {"type": "fixedValue", "value": zero}},
            "p": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": zero, "p": 0.0},
        # TIGHT inner solves: the forward-AD triangulation differentiates
        # custom_linear_solve, whose tangent systems are solved at the
        # PRIMAL's tolerances — loose inner solves leak straight into the
        # jvp (measured: defaults -> adjoint-vs-jvp 6.5e-4; pRelTol
        # 1e-11 -> 1.2e-6). Same reasoning as test_cht (round-3 fix).
        "primalLinearSolver": {"pMaxIters": 400, "pRelTol": 1e-12,
                               "uMaxIters": 200, "uRelTol": 1e-12},
        "function": {
            "lidF": {"type": "force", "patches": ["ymax"],
                     "directionMode": "fixedDirection",
                     "direction": [1.0, 0.0, 0.0], "scale": 1.0,
                     "timeOp": "average", "timeOpFracStart": 0.4},
        },
        "adjEqnOption": {"gmresRelTol": 1e-11, "gmresRestart": 200,
                         "gmresMaxIters": 1000, "pcType": "none"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def case():
    solver, inputs = cavity_unsteady()
    hist_fn = jax.jit(solver.solve_primal_history)
    stT, hist = hist_fn(solver.init_state(), inputs)
    return solver, inputs, stT, hist, hist_fn


def test_unsteady_primal(case):
    solver, inputs, stT, hist, _ = case
    assert bool(solver.states_valid(stT))
    # per-step residual small (PIMPLE converged within the step)
    W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
    r = solver.residuals_unsteady(stT, W_old, W_old, inputs)
    assert float(jnp.abs(r["U"]).max()) < 5e-3
    # the flow spins up: lid force magnitude decreases toward steady state
    _, vals = solver.eval_function_history("lidF", hist, inputs)
    v = np.abs(np.asarray(vals))
    assert v[0] > v[-1]


def test_unsteady_adjoint_vs_fd(case):
    solver, inputs, stT, hist, hist_fn = case
    adj = jax.jit(lambda h, i: solver.solve_unsteady_adjoint(h, i, "lidF"))
    tot, resids = adj(hist, inputs)
    assert np.asarray(resids).max() < 1e-10
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
    # whole time loop + reduction — the exact forward twin of the
    # reverse-scan adjoint
    def J_of_nu(nu):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["nu"] = nu
        _, h = solver.solve_primal_history(solver.init_state(), inp)
        return solver.eval_function_history("lidF", h, inp)[0]

    _, dJ_fwd = jax.jvp(J_of_nu, (inputs["params"]["nu"],),
                        (jnp.ones((), solver.dtype),))
    # bar: the reverse adjoint linearizes R(W^n)=0 at the stored history
    # while the jvp differentiates the computed program — they agree only
    # up to the per-step outer residual times sensitivity. Convergence-
    # scaled bound (tests/convbar.py): tightens automatically when inner
    # solves are tightened, capped at the historical 1e-5.
    from convbar import last_step_residual, rel_bar
    res = last_step_residual(solver, stT, hist, inputs)
    bar = rel_bar(res, solver.dtype, cap=1e-5)
    assert dnu == pytest.approx(float(dJ_fwd), rel=bar), \
        (dnu, float(dJ_fwd), res, bar)


def test_unsteady_adjoint_with_amortized_pc(case):
    """Segregated PC + PCMatUpdateInterval amortization (reference
    PCMatPrecomputeInterval, mphys_dafoam.py:1443-1485): same totals as
    the unpreconditioned sweep."""
    solver, inputs, stT, hist, hist_fn = case
    tot0, _ = solver.solve_unsteady_adjoint(hist, inputs, "lidF")
    solver.option.set("adjEqnOption.pcType", "segregated")
    solver.option.set("unsteadyAdjoint.PCMatUpdateInterval", 2)
    try:
        tot1, resids = solver.solve_unsteady_adjoint(hist, inputs, "lidF")
    finally:
        solver.option.set("adjEqnOption.pcType", "none")
        solver.option.set("unsteadyAdjoint.PCMatUpdateInterval", 1)
    assert np.asarray(resids).max() < 1e-10
    assert float(tot1["params"]["nu"]) == pytest.approx(
        float(tot0["params"]["nu"]), rel=1e-8)


def test_unsteady_adjoint_checkpointed_matches_inmemory(case):
    """Checkpoint/recompute reverse sweep (memory O(seg_len + T/seg_len))
    reproduces the in-memory totals."""
    solver, inputs, stT, hist, hist_fn = case
    tot0, _ = solver.solve_unsteady_adjoint(hist, inputs, "lidF")
    tot1, resids, J = solver.solve_unsteady_adjoint_checkpointed(
        solver.init_state(), inputs, "lidF", seg_len=1)
    assert float(tot1["params"]["nu"]) == pytest.approx(
        float(tot0["params"]["nu"]), rel=1e-9)
    # lid BC totals too
    np.testing.assert_allclose(np.asarray(tot1["bc"]["U"]["ymax"]),
                               np.asarray(tot0["bc"]["U"]["ymax"]),
                               rtol=1e-9, atol=1e-11)
    # a coarser segmentation gives the same result
    tot5, _, _ = solver.solve_unsteady_adjoint_checkpointed(
        solver.init_state(), inputs, "lidF", seg_len=5)
    assert float(tot5["params"]["nu"]) == pytest.approx(
        float(tot0["params"]["nu"]), rel=1e-9)


def test_bdf2_unsteady_adjoint_vs_fd():
    """ddtScheme backward (BDF2) with the Euler bootstrap: adjoint incl.
    the dR/dW_oldold cross terms vs FD (reference ddtSchemeOrder=2,
    calcdRdWOldTPsiAD(2, ...), DASolver.C:1910)."""
    solver, inputs = cavity_unsteady()
    solver.option.set("ddtScheme", "backward")
    solver = type(solver)(solver.option, solver.topo,
                          np.asarray(solver.points))
    assert solver.ddt_order == 2
    inputs = solver.make_inputs()
    hist_fn = jax.jit(solver.solve_primal_history)
    stT, hist = hist_fn(solver.init_state(), inputs)
    assert bool(solver.states_valid(stT))
    tot, resids = solver.solve_unsteady_adjoint(hist, inputs, "lidF")
    assert np.asarray(resids).max() < 1e-10
    dnu = float(tot["params"]["nu"])

    def runJ(nu):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["nu"] = jnp.asarray(nu, solver.dtype)
        _, h = hist_fn(solver.init_state(), inp)
        J, _ = solver.eval_function_history("lidF", h, inp)
        return float(J)

    eps = 1e-6
    fd = (runJ(0.01 + eps) - runJ(0.01 - eps)) / (2 * eps)
    assert dnu == pytest.approx(fd, rel=1e-6), (dnu, fd)
