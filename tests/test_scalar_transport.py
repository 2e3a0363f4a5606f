"""End-to-end slice: primal -> adjoint -> total derivative, triangulated
against forward-mode AD and finite differences — the same oracle the
reference CI uses (SURVEY.md §4: adjoint vs forward-AD cross-validation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh, compute_geometry
from dafoam_tpu.solvers import make_solver


def make_case(nx=8, ny=6):
    pts, topo = box_hex_mesh(nx, ny, 1, (1.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    options = {
        "solverName": "DAScalarTransportFoam",
        "ddtScheme": "steadyState",
        "transportProperties": {"DT": 0.05},
        "boundaryConditions": {
            "T": {
                "xmin": {"type": "fixedValue", "value": 1.0},
                "xmax": {"type": "zeroGradient"},
                "ymin": {"type": "fixedValue", "value": 0.0},
                "ymax": {"type": "zeroGradient"},
            },
            "U": {
                "xmin": {"type": "fixedValue", "value": [1.0, 0.2, 0.0]},
                "xmax": {"type": "zeroGradient"},
                "ymin": {"type": "fixedValue", "value": [1.0, 0.2, 0.0]},
                "ymax": {"type": "zeroGradient"},
            },
        },
        "initialFields": {"T": 0.0},
        "function": {
            "TMean": {"type": "patchMean", "patches": ["xmax"],
                      "varName": "T", "scale": 1.0},
            "TVolSum": {"type": "variableVolSum", "varName": "T",
                        "scale": 1.0},
        },
        "normalizeStates": {"T": 1.0},
        "adjEqnOption": {"gmresRelTol": 1e-12, "gmresRestart": 60},
    }
    solver = make_solver(options, topo, pts)
    inputs = solver.make_inputs()
    # frozen convecting velocity field
    inputs["params"]["U"] = jnp.tile(
        jnp.asarray([1.0, 0.2, 0.0], solver.dtype), (topo.n_cells, 1))
    return solver, inputs


def test_primal_converges_and_is_physical():
    solver, inputs = make_case()
    state, info = solver.solve_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    assert not bool(info.failed)
    T = np.asarray(state["T"])
    assert T.min() > -1e-8 and T.max() < 1.0 + 1e-8  # bounded by BCs
    r = solver.residuals(state, inputs)
    assert np.abs(np.asarray(r["T"])).max() < 1e-9


def test_adjoint_matches_forward_and_fd():
    solver, inputs = make_case()
    state, _ = solver.solve_primal(solver.init_state(), inputs)

    psi, info = solver.solve_adjoint(state, inputs, "TMean")
    assert bool(info.converged), (info.resid0, info.resid)
    totals = solver.total_derivative(state, inputs, "TMean", psi)

    dJ_dTin_adj = float(totals["bc"]["T"]["xmin"])
    dJ_dDT_adj = float(totals["params"]["DT"])

    # --- forward-mode AD (the reference's ADF cross-check) ------------
    def seed(path_fn):
        dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
        return path_fn(dx)

    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["bc"]["T"]["xmin"] = jnp.asarray(1.0, solver.dtype)
    dJ_fwd, finfo = solver.forward_total_derivative(state, inputs, "TMean", dx)
    assert abs(dJ_dTin_adj - float(dJ_fwd)) < 1e-8 * max(1, abs(dJ_dTin_adj))

    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["params"]["DT"] = jnp.asarray(1.0, solver.dtype)
    dJ_fwd2, _ = solver.forward_total_derivative(state, inputs, "TMean", dx)
    assert abs(dJ_dDT_adj - float(dJ_fwd2)) < 1e-8 * max(1, abs(dJ_dDT_adj))

    # --- finite difference --------------------------------------------
    def run_J(tin, dt_coef):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["bc"]["T"]["xmin"] = jnp.asarray(tin, solver.dtype)
        inp["params"]["DT"] = jnp.asarray(dt_coef, solver.dtype)
        st, _ = solver.solve_primal(solver.init_state(), inp)
        return float(solver.eval_function("TMean", st, inp))

    eps = 1e-6
    fd_tin = (run_J(1.0 + eps, 0.05) - run_J(1.0 - eps, 0.05)) / (2 * eps)
    fd_dt = (run_J(1.0, 0.05 + eps) - run_J(1.0, 0.05 - eps)) / (2 * eps)
    assert abs(dJ_dTin_adj - fd_tin) < 5e-6 * max(1.0, abs(fd_tin))
    assert abs(dJ_dDT_adj - fd_dt) < 5e-5 * max(1.0, abs(fd_dt))


def test_volcoord_shape_derivative():
    """dJ/d(points) — the reference's volCoord input (DAInputVolCoord):
    adjoint total vs FD on one interior mesh point."""
    solver, inputs = make_case()
    state, _ = solver.solve_primal(solver.init_state(), inputs)
    psi, info = solver.solve_adjoint(state, inputs, "TVolSum")
    assert bool(info.converged)
    totals = solver.total_derivative(state, inputs, "TVolSum", psi)
    g_pts = np.asarray(totals["points"])

    pt, comp = 15, 1

    def run_J(shift):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["points"] = inputs["points"].at[pt, comp].add(shift)
        st, _ = solver.solve_primal(solver.init_state(), inp)
        return float(solver.eval_function("TVolSum", st, inp))

    eps = 1e-6
    fd = (run_J(eps) - run_J(-eps)) / (2 * eps)
    assert abs(g_pts[pt, comp] - fd) < 2e-5 * max(1.0, abs(fd)), \
        (g_pts[pt, comp], fd)
