"""Conjugate heat transfer: fluid channel over a heated solid slab.

Covers the reference's aerothermal path (runRegTests_AeroThermal.py;
coupling protocol of DAOutputThermalCoupling/DAInputThermalCoupling):
block-Gauss-Seidel coupled primal with Robin interface BCs, and the
MONOLITHIC coupled adjoint over the union state vs FD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.coupling import CHTCoupling
from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NX = 12
NU = 1e-4
T_HOT = 350.0
T_IN = 300.0


def build():
    # ---- fluid: channel y in [0, 0.1] --------------------------------
    pts_f, topo_f = box_hex_mesh(NX, 6, 1, (1.0, 0.1, 0.01),
                                 kinds={"zmin": "empty", "zmax": "empty",
                                        "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts_f = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "divSchemes": {"div(phi,U)": "upwind"},
        "transportProperties": {"nu": NU, "Pr": 0.7, "Prt": 0.85,
                                "Cp": 1004.5},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "fixedValue", "value": zero}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "T": {"xmin": {"type": "fixedValue", "value": T_IN},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "mixed"},         # coupling patch
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0, "T": T_IN},
        "primalMinResTol": 1e-10,
        "primalMaxIters": 600,
        # near-exact inner solves: custom_linear_solve's implicit JVP/VJP
        # rules solve tangent systems to these SAME tolerances, so the
        # forward-AD triangulation below measures AD plumbing only when
        # solver noise is below its assert tolerance (72-cell mesh: cheap)
        "primalLinearSolver": {"pMaxIters": 500, "pRelTol": 1e-12,
                               "uMaxIters": 300, "uRelTol": 1e-12,
                               "turbMaxIters": 300, "turbRelTol": 1e-12},
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "T": 0.9}},
        "function": {"Tout": {"type": "patchMean", "patches": ["xmax"],
                              "varName": "T", "scale": 1.0}},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0, "T": T_IN},
    }
    fluid = make_solver(opts_f, topo_f, pts_f)

    # ---- solid: slab y in [-0.05, 0] -----------------------------------
    pts_s, topo_s = box_hex_mesh(NX, 4, 1, (1.0, 0.05, 0.01),
                                 kinds={"zmin": "empty", "zmax": "empty"})
    pts_s = pts_s.copy()
    pts_s[:, 1] -= 0.05
    opts_s = {
        "solverName": "DAHeatTransferFoam",
        "transportProperties": {"kappa": 1.0},
        "boundaryConditions": {
            "T": {"ymin": {"type": "fixedValue", "value": T_HOT},
                  "ymax": {"type": "mixed"},         # coupling patch
                  "xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "zeroGradient"}},
        },
        "initialFields": {"T": T_HOT},
        "primalMinResTol": 1e-10,
        "primalMaxIters": 200,
        "primalLinearSolver": {"pMaxIters": 500, "pRelTol": 1e-12,
                               "uMaxIters": 300, "uRelTol": 1e-12,
                               "turbMaxIters": 300, "turbRelTol": 1e-12},
        "function": {},
        "normalizeStates": {"T": T_HOT},
    }
    solid = make_solver(opts_s, topo_s, pts_s)
    return fluid, solid


@pytest.fixture(scope="module")
def case():
    fluid, solid = build()
    cht = CHTCoupling(fluid, solid, "ymin", "ymax")
    inf = fluid.make_inputs()
    ins = solid.make_inputs()
    sf, ss, infos = cht.solve_primal(fluid.init_state(), solid.init_state(),
                                     inf, ins, n_outer=25)
    return cht, fluid, solid, inf, ins, sf, ss


def test_cht_coupled_primal(case):
    cht, fluid, solid, inf, ins, sf, ss = case
    # interface temperature continuity
    mism = float(cht.interface_mismatch(sf, ss, inf, ins))
    assert mism < 1e-6, mism
    # fluid heats up downstream; solid cools toward the interface
    Tf = np.asarray(sf["T"])
    Ts = np.asarray(ss["T"])
    assert Tf.max() > T_IN + 1.0
    assert Ts.min() < T_HOT - 0.5
    # coupled residual ~ 0 at the converged pair
    r = cht.residuals({"fluid": sf, "solid": ss}, inf, ins)
    for side in ("fluid", "solid"):
        for k, v in r[side].items():
            assert float(jnp.abs(v).max()) < 1e-5, (side, k)


def test_cht_coupled_adjoint_vs_fd(case):
    cht, fluid, solid, inf, ins, sf, ss = case
    tot_f, tot_s, info = cht.solve_adjoint(sf, ss, inf, ins,
                                           "fluid", "Tout")
    dThot = float(tot_s["bc"]["T"]["ymin"])

    def runJ(th):
        ins2 = jax.tree_util.tree_map(lambda x: x, ins)
        ins2["bc"]["T"]["ymin"] = jnp.asarray(th, solid.dtype)
        s_f, s_s, _ = cht.solve_primal(fluid.init_state(),
                                       solid.init_state(), inf, ins2,
                                       n_outer=25)
        inf2, _ = cht._apply_coupling(inf, ins2, s_f, s_s)
        return float(fluid.eval_function("Tout", s_f, inf2))

    eps = 1e-3
    fd = (runJ(T_HOT + eps) - runJ(T_HOT - eps)) / (2 * eps)
    assert dThot == pytest.approx(fd, rel=5e-4), (dThot, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46): jvp through
    # the coupled Gauss-Seidel sweep — same coupling-convergence limit as
    # FD, none of its step-size noise
    def J_of_th(th):
        ins2 = jax.tree_util.tree_map(lambda x: x, ins)
        ins2["bc"]["T"]["ymin"] = th
        s_f, s_s, _ = cht.solve_primal(fluid.init_state(),
                                       solid.init_state(), inf, ins2,
                                       n_outer=25)
        inf2, _ = cht._apply_coupling(inf, ins2, s_f, s_s)
        return fluid.eval_function("Tout", s_f, inf2)

    _, dJ_fwd = jax.jvp(J_of_th, (ins["bc"]["T"]["ymin"],),
                        (jnp.ones_like(ins["bc"]["T"]["ymin"]),))
    assert dThot == pytest.approx(float(dJ_fwd), rel=5e-4), (dThot,
                                                             float(dJ_fwd))
