"""DAHisaFoam: density-based transonic Euler on a bump channel.

Mirrors the reference's HiSA role (DAHisaFoam + DAResidualHisaFoam JST
flux): primal converges on a transonic bump, the flow accelerates over
the bump (max Mach > inlet Mach), and the adjoint total derivative of
the bump pressure drag w.r.t. the inlet velocity matches finite
differences AND the forward-mode linearization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

MACH_IN = 0.675
T_IN = 300.0
P_OUT = 1.0e5
R = 287.0
GAMMA = 1.4


def bump_channel(nx=60, ny=16, h=0.06):
    """Channel [0,3]x[0,1] with a Gaussian bump on the lower wall."""
    pts, topo = box_hex_mesh(nx, ny, 1, (3.0, 1.0, 0.05),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    pts = np.asarray(pts).copy()
    x, y = pts[:, 0], pts[:, 1]
    bump = h * np.exp(-((x - 1.5) / 0.4) ** 2)
    pts[:, 1] = y + bump * (1.0 - y / 1.0)
    return pts, topo


def make_hisa(uin):
    pts, topo = bump_channel()
    opts = {
        "solverName": "DAHisaFoam",
        "turbulenceModel": "None",
        "hisa": {"inviscid": True, "fluxScheme": "AUSMPlusUp",
                 "cfl": 5.0, "cflMax": 1e4, "innerIters": 240},
        "transportProperties": {"R": R, "gamma": GAMMA},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [uin, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "slip"}, "ymax": {"type": "slip"}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": P_OUT},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "T": {"xmin": {"type": "fixedValue", "value": T_IN},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [uin, 0.0, 0.0], "p": P_OUT, "T": T_IN},
        "primalMinResTol": 1e-7,   # relative residual drop
        "primalMinIters": 10, "primalMaxIters": 300,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
        "function": {
            "CDp": {"type": "force", "patches": ["ymin"],
                    "directionMode": "fixedDirection",
                    "direction": [1.0, 0.0, 0.0], "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 600, "gmresAbsTol": 1e-16,
                         "pcType": "blockJacobian", "pcInnerIters": 12},
        "normalizeStates": {"U": 240.0, "p": 1e5, "T": 300.0},
        "primalVarBounds": {"pMin": 1e3, "TMin": 50.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


UIN = MACH_IN * float(np.sqrt(GAMMA * R * T_IN))


@pytest.fixture(scope="module")
def converged():
    solver, inputs = make_hisa(UIN)
    st, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, st, info


def test_transonic_bump_primal(converged):
    solver, inputs, st, info = converged
    assert bool(info.converged), (float(info.max_res), int(info.iters))
    # Mach field: accelerates over the bump beyond the inlet Mach
    c = jnp.sqrt(GAMMA * R * st["T"])
    mach = jnp.linalg.norm(st["U"], axis=-1) / c
    assert float(jnp.max(mach)) > MACH_IN + 0.05
    assert float(jnp.max(mach)) < 1.6
    # inflow roughly preserved
    assert abs(float(jnp.mean(st["T"])) - T_IN) < 30.0


def test_hisa_adjoint_vs_fd_and_forward(converged):
    solver, inputs, st, info = converged
    J0 = float(solver.run_function("CDp", st, inputs))
    psi, ai = solver.run_adjoint("CDp", st, inputs)
    assert float(ai.resid) < 1e-8 * float(ai.resid0) + 1e-14
    tot = solver.run_totals("CDp", st, inputs, psi)
    dJdU_in = float(np.asarray(tot["bc"]["U"]["xmin"])[0])

    # forward-mode cross-check (the reference's ADF build triangulation)
    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["bc"]["U"]["xmin"] = jnp.asarray([1.0, 0.0, 0.0], solver.dtype)
    dJ_fwd, _ = solver.forward_total_derivative(st, inputs, "CDp", dx)
    assert dJdU_in == pytest.approx(float(dJ_fwd), rel=1e-6)

    # FD of the full pipeline (perturb the inlet through `inputs` so the
    # compiled primal is reused — inputs are traced arguments)
    h = 1e-3 * UIN

    def run(uin):
        i2 = jax.tree_util.tree_map(lambda x: x, inputs)
        i2["bc"]["U"]["xmin"] = jnp.asarray([uin, 0.0, 0.0], solver.dtype)
        st2, inf2 = solver.run_primal(solver.init_state(), i2)
        assert bool(inf2.converged)
        return float(solver.run_function("CDp", st2, i2))

    fd = (run(UIN + h) - run(UIN - h)) / (2 * h)
    assert dJdU_in == pytest.approx(fd, rel=2e-4)
