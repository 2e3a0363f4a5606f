"""Tolerance-locked golden-value regression harness.

The reference CI locks every case's objective and total-derivative
values against checked-in reference output at fixed tolerances
(/root/reference/tests/testFuncs.py: regTest compares new vs ref dicts
key-by-key at 1e-4..1e-10 depending on quantity). This module is the
dafoam_tpu analog: each case computes a dict of scalar "signals"
(objective, adjoint totals, shape-gradient norm) on the deterministic
CPU float64 backend and compares against tests/golden/values.json.

Regenerate after an INTENTIONAL numerics change with:

    DAFOAM_TPU_WRITE_GOLDEN=1 python -m pytest tests/test_golden.py -q

and commit the diff of tests/golden/values.json (the diff is the
reviewable record of what moved, like the reference's refs/*.txt).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "values.json")
WRITE = os.environ.get("DAFOAM_TPU_WRITE_GOLDEN") == "1"

# objective values reproduce to machine-level on one backend; totals go
# through FGMRES at gmresRelTol<=1e-10 so they carry that noise floor.
REL_OBJ = 1e-8
REL_GRAD = 1e-6


# ---------------------------------------------------------------------------
# cases: each returns {signal_name: float}. Keep them SMALL (seconds).
# ---------------------------------------------------------------------------

def _case_cavity_simple():
    """Laminar lid-driven cavity, DASimpleFoam: lid force + dF/dnu +
    shape-gradient norm (full SIMPLE machinery incl. flux state)."""
    zero = [0.0, 0.0, 0.0]
    pts, topo = box_hex_mesh(10, 10, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.01},
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
        "primalMaxIters": 500,
        "relaxationFactors": {"fields": {"p": 0.3},
                              "equations": {"U": 0.7}},
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
    inputs = solver.make_inputs()
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    J = float(solver.run_function("lidForce", state, inputs))
    psi, ai = solver.run_adjoint("lidForce", state, inputs)
    tot = solver.run_totals("lidForce", state, inputs, psi)
    return {
        "lidForce": J,
        "dLidForce_dnu": float(tot["params"]["nu"]),
        "dLidForce_dUlid_x": float(tot["bc"]["U"]["ymax"][0]),
        "dLidForce_dpoints_norm":
            float(jnp.linalg.norm(tot["points"])),
    }


def _case_scalar_transport():
    """Steady convection-diffusion, DAScalarTransportFoam: outlet mean +
    diffusivity/inlet-value totals."""
    pts, topo = box_hex_mesh(8, 6, 1, (1.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    opts = {
        "solverName": "DAScalarTransportFoam",
        "ddtScheme": "steadyState",
        "transportProperties": {"DT": 0.05},
        "boundaryConditions": {
            "T": {"xmin": {"type": "fixedValue", "value": 1.0},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": 0.0},
                  "ymax": {"type": "zeroGradient"}},
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.2, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": [1.0, 0.2, 0.0]},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"T": 0.0},
        "function": {
            "TMean": {"type": "patchMean", "patches": ["xmax"],
                      "varName": "T", "scale": 1.0},
        },
        "normalizeStates": {"T": 1.0},
        "adjEqnOption": {"gmresRelTol": 1e-12, "gmresRestart": 60},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    inputs["params"]["U"] = jnp.tile(
        jnp.asarray([1.0, 0.2, 0.0], solver.dtype), (topo.n_cells, 1))
    state, info = solver.solve_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    J = float(solver.eval_function("TMean", state, inputs))
    psi, ai = solver.solve_adjoint(state, inputs, "TMean")
    assert bool(ai.converged)
    tot = solver.total_derivative(state, inputs, "TMean", psi)
    return {
        "TMean": J,
        "dTMean_dDT": float(tot["params"]["DT"]),
        "dTMean_dTin": float(tot["bc"]["T"]["xmin"]),
        "dTMean_dpoints_norm": float(jnp.linalg.norm(tot["points"])),
    }


def _case_heat_radiation():
    """Conduction + P1 radiation, DAHeatTransferFoam: mean temperature +
    absorptivity total (coupled T-G adjoint)."""
    pts, topo = box_hex_mesh(10, 6, 1, (1.0, 0.5, 0.05),
                             kinds={"zmin": "empty", "zmax": "empty"})
    opts = {
        "solverName": "DAHeatTransferFoam",
        "transportProperties": {"kappa": 10.0},
        "boundaryConditions": {
            "T": {"xmin": {"type": "fixedValue", "value": 1000.0},
                  "xmax": {"type": "fixedValue", "value": 400.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "G": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"T": 700.0, "G": 4.0 * 5.67e-8 * 700.0 ** 4},
        "primalMinResTol": 1e-7, "primalMaxIters": 200,
        "function": {"Tm": {"type": "variableVolSum", "varName": "T",
                            "scale": 1.0, "divByTotalVol": 1}},
        "normalizeStates": {"T": 700.0, "G": 5e4},
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 200,
                         "gmresMaxIters": 1500, "pcType": "none"},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    inputs["params"]["radiationAbsorptivity"] = jnp.asarray(
        0.5, solver.dtype)
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    J = float(solver.run_function("Tm", state, inputs))
    psi, ai = solver.run_adjoint("Tm", state, inputs)
    tot = solver.run_totals("Tm", state, inputs, psi)
    return {
        "Tm": J,
        "dTm_dAbsorptivity":
            float(tot["params"]["radiationAbsorptivity"]),
        "dTm_dkappa": float(tot["params"]["kappa"]),
    }


def _case_naca_sa():
    """NACA0012 O-mesh SIMPLE+SA (the north-star physics at golden-harness
    scale): drag + viscosity/shape totals through the full segregated
    machinery incl. the SA model state and the flux state (reference
    regression analog: runRegTests_DASimpleFoam.py)."""
    from dafoam_tpu.mesh.airfoil import omesh_naca0012

    nu = 1e-3
    uinf = [1.0, 0.0, 0.0]
    pts, topo = omesh_naca0012(n_wrap=32, n_radial=12, radius=15.0,
                               first_cell=4e-3)
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "SpalartAllmaras",
        "transportProperties": {"nu": nu},
        "boundaryConditions": {
            "U": {"far": {"type": "inletOutlet", "value": uinf},
                  "wing": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {"far": {"type": "fixedValue", "value": 0.0},
                  "wing": {"type": "zeroGradient"}},
            "nuTilda": {"far": {"type": "inletOutlet", "value": 3 * nu},
                        "wing": {"type": "fixedValue", "value": 0.0}},
        },
        "initialFields": {"U": uinf, "p": 0.0, "nuTilda": 3 * nu},
        "primalMinResTol": 1e-10, "primalMaxIters": 1500,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "primalLinearSolver": {"pMaxIters": 200, "pRelTol": 0.02,
                               "uMaxIters": 50, "uRelTol": 0.05,
                               "turbMaxIters": 50, "turbRelTol": 0.05},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-9, "gmresRestart": 400,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    J = float(solver.run_function("CD", state, inputs))
    psi, ai = solver.run_adjoint("CD", state, inputs)
    assert bool(ai.converged)
    tot = solver.run_totals("CD", state, inputs, psi)
    return {
        "CD": J,
        "dCD_dnu": float(tot["params"]["nu"]),
        "dCD_dpoints_norm": float(jnp.linalg.norm(tot["points"])),
    }


def _case_rho_channel():
    """Compressible heated channel, DARhoSimpleFoam: outlet temperature,
    mass flow, and wall-temperature total (locks the rho/energy coupling
    the incompressible cases never touch)."""
    import test_rho_simple

    solver, inputs = test_rho_simple.channel()
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    Tout = float(solver.run_function("Tout", state, inputs))
    mdot = float(solver.run_function("mdot", state, inputs))
    psi, ai = solver.run_adjoint("Tout", state, inputs)
    assert bool(ai.converged)
    tot = solver.run_totals("Tout", state, inputs, psi)
    return {
        "Tout": Tout,
        "mdot": mdot,
        "dTout_dTwall": float(tot["bc"]["T"]["ymin"]),
        "dTout_dpoints_norm": float(jnp.linalg.norm(tot["points"])),
    }


def _case_pimple_unsteady():
    """Unsteady lid-driven cavity, DAPimpleFoam + timeOp average: the
    time-accurate reverse-sweep adjoint (locks the BDF time scheme and
    the reverse-scan machinery; reference runRegTests_DAPimpleFoam.py)."""
    import test_pimple_unsteady

    solver, inputs = test_pimple_unsteady.cavity_unsteady()
    stT, hist = jax.jit(solver.solve_primal_history)(
        solver.init_state(), inputs)
    assert bool(solver.states_valid(stT))
    J = float(solver.eval_function_history("lidF", hist, inputs)[0])
    tot, resids = solver.solve_unsteady_adjoint(hist, inputs, "lidF")
    assert float(np.asarray(resids).max()) < 1e-9
    return {
        "lidF_avg": J,
        "dlidF_dnu": float(tot["params"]["nu"]),
        "dlidF_dpoints_norm": float(jnp.linalg.norm(tot["points"])),
    }


CASES = {
    "cavity_simple": _case_cavity_simple,
    "scalar_transport": _case_scalar_transport,
    "heat_radiation": _case_heat_radiation,
    "naca_sa": _case_naca_sa,
    "rho_channel": _case_rho_channel,
    "pimple_unsteady": _case_pimple_unsteady,
}


def _load_golden():
    if not os.path.exists(GOLDEN_PATH):
        return {}
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def _store_golden(name, values):
    """Read-modify-write of the shared values.json. NOTE: regeneration
    (DAFOAM_TPU_WRITE_GOLDEN=1) must run WITHOUT pytest-xdist (-n) —
    concurrent writers would race and drop case entries."""
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    golden = _load_golden()
    golden[name] = values
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=2, sort_keys=True)
        f.write("\n")


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    values = CASES[name]()
    assert all(np.isfinite(v) for v in values.values()), values
    if WRITE:
        _store_golden(name, values)
        pytest.skip(f"golden values for {name} regenerated")
    golden = _load_golden()
    assert name in golden, (
        f"no golden entry for {name}; regenerate with "
        "DAFOAM_TPU_WRITE_GOLDEN=1")
    ref = golden[name]
    assert set(ref) == set(values), (sorted(ref), sorted(values))
    for key, got in values.items():
        want = ref[key]
        # explicit convention: gradient signals are named d<F>_d<x>
        # (startswith, not substring — an objective named e.g. "p_drop"
        # must NOT inherit the 100x looser gradient tolerance)
        rel = REL_GRAD if key.startswith("d") else REL_OBJ
        tol = rel * max(1.0, abs(want))
        assert abs(got - want) <= tol, (
            f"{name}.{key}: got {got!r}, golden {want!r} "
            f"(|diff|={abs(got - want):.3e} > tol={tol:.3e})")
