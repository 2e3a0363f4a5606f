"""DARhoSimpleCFoam transonic validation (reference
runRegTests_DARhoSimpleCFoam.py role: the transonic psi-linearized
implicit div(phid, p) SIMPLEC pressure equation).

Case: the Gaussian-bump channel at M_in = 0.74 — a supersonic pocket
(max local Mach > 1) forms over the bump.  Stabilizers exercised here are
the reference/OpenFOAM transonic practice re-designed as solver features:
rho under-relaxation (relaxationFactors.fields.rho), transonic pEqn
matrix relaxation (relaxationFactors.equations.p — OpenFOAM
"pEqn.relax() to ensure diagonal-dominance"), and subsonic warm-start
sequencing (transonicInit* options).  Adjoint dCD/d(U_in) is checked
against FD through the same compiled pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

R, GAMMA = 287.0, 1.4
T_IN = 300.0
P_OUT = 1.0e5
MACH_IN = 0.74
UIN = MACH_IN * float(np.sqrt(GAMMA * R * T_IN))


def bump_channel(nx=60, ny=16, h=0.06):
    pts, topo = box_hex_mesh(nx, ny, 1, (3.0, 1.0, 0.05),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    pts = np.asarray(pts).copy()
    x, y = pts[:, 0], pts[:, 1]
    bump = h * np.exp(-((x - 1.5) / 0.4) ** 2)
    pts[:, 1] = y + bump * (1.0 - y / 1.0)
    return pts, topo


def make_case():
    pts, topo = bump_channel()
    uin = [UIN, 0.0, 0.0]
    opts = {
        "solverName": "DARhoSimpleCFoam",
        "turbulenceModel": "None",
        "transportProperties": {"mu": 1e-5, "Cp": 1004.5, "R": R,
                                "Pr": 0.7},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": uin},
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
        "initialFields": {"U": uin, "p": P_OUT, "T": T_IN},
        "primalMinResTol": 1e-5,
        "primalMinIters": 50, "primalMaxIters": 8000,
        "primalVarBounds": {"pMin": 1e3, "TMin": 50.0},
        "relaxationFactors": {"fields": {"p": 0.3, "rho": 0.05},
                              "equations": {"U": 0.7, "T": 0.7,
                                            "p": 0.5}},
        "function": {
            "CDp": {"type": "force", "patches": ["ymin"],
                    "directionMode": "fixedDirection",
                    "direction": [1.0, 0.0, 0.0], "scale": 1.0},
        },
        # unrestarted GMRES: restart cycles stagnate on the transonic
        # div(phid,p)-coupled adjoint (measured: restart 300 stalls at
        # rel 3e-3; full Krylov converges to 1e-10 in ~1200 its)
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 1500,
                         "gmresMaxIters": 1500, "gmresAbsTol": 1e-16,
                         "pcType": "segregated"},
        "normalizeStates": {"U": UIN, "p": P_OUT, "T": T_IN, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def converged():
    solver, inputs = make_case()
    st, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, st, info


def test_transonic_primal(converged):
    solver, inputs, st, info = converged
    assert bool(info.converged), (float(info.max_res), int(info.iters))
    c = jnp.sqrt(GAMMA * R * st["T"])
    mach = jnp.linalg.norm(st["U"], axis=-1) / c
    # supersonic pocket over the bump, bounded
    assert float(jnp.max(mach)) > 1.0
    assert float(jnp.max(mach)) < 1.3
    # flow accelerates then recompresses: pressure dips below outlet
    assert float(jnp.min(st["p"])) < 0.85 * P_OUT
    assert float(jnp.max(st["p"])) > 1.02 * P_OUT


def test_transonic_adjoint_vs_fd(converged):
    solver, inputs, st, info = converged
    J0 = float(solver.run_function("CDp", st, inputs))
    psi, ai = solver.run_adjoint("CDp", st, inputs)
    assert float(ai.resid) < 1e-8 * float(ai.resid0) + 1e-14
    tot = solver.run_totals("CDp", st, inputs, psi)
    g = float(np.asarray(tot["bc"]["U"]["xmin"])[0])

    def run(du):
        i2 = jax.tree_util.tree_map(lambda x: x, inputs)
        i2["bc"]["U"]["xmin"] = jnp.asarray([UIN + du, 0.0, 0.0],
                                            solver.dtype)
        st2, inf2 = solver.run_primal(solver.init_state(), i2)
        assert bool(inf2.converged)
        return float(solver.run_function("CDp", st2, i2))

    h = 2e-3 * UIN
    fd = (run(h) - run(-h)) / (2 * h)
    assert g == pytest.approx(fd, rel=5e-3), (g, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46)
    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["bc"]["U"]["xmin"] = jnp.asarray([1.0, 0.0, 0.0], solver.dtype)
    dJ_fwd, _ = solver.forward_total_derivative(st, inputs, "CDp", dx)
    assert g == pytest.approx(float(dJ_fwd), rel=1e-6), (g, float(dJ_fwd))
