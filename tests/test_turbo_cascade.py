"""DATurboFoam validation: compressible + MRF together (reference
runRegTests_DATurboFoamTransonic.py role: CompressorFluid case, MRF
rotating zone, totalTemperatureRatio + massFlowRate objectives,
dJ/d(omega)).

Case: a narrow annular blade channel (azimuthal flow between two
rotating walls, gap 0.05 at r ~ 0.8, fully viscous) spinning about z
faster than the through-flow — the rotating walls drag the flow, doing
work on it, so the mass-flow-averaged total-temperature ratio exceeds 1
and responds to the rotation speed.  dTTR/dOmega and dMFR/dOmega are
verified against FD (the differentiable-omega capability MRFDF exists
for).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

R1, R2 = 0.8, 0.85
THETA = 1.0
OMEGA = 10.0
UIN = 30.0
P0 = 101325.0
T0 = 300.0
MU = 2e-3


def channel_mesh(nth=24, nr=8):
    pts, topo = box_hex_mesh(nth, nr, 1, (1.0, 1.0, 1.0),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    pts = np.asarray(pts).copy()
    th = pts[:, 0] * THETA
    # r DECREASES with y so the (theta, r) map keeps a positive Jacobian
    # (x->theta, y->r inverts every cell); ymin is the outer wall
    r = R2 - pts[:, 1] * (R2 - R1)
    z = pts[:, 2] * 0.02
    pts[:, 0] = r * np.cos(th)
    pts[:, 1] = r * np.sin(th)
    pts[:, 2] = z
    return pts, topo


def make_case(omega=OMEGA):
    pts, topo = channel_mesh()
    uin = [0.0, UIN, 0.0]  # azimuthal at theta=0
    opts = {
        "solverName": "DATurboFoam",
        "turbulenceModel": "None",
        "transportProperties": {"mu": MU, "Cp": 1004.5, "R": 287.0,
                                "Pr": 0.7},
        "MRF": {"active": True, "origin": [0.0, 0.0, 0.0],
                "axis": [0.0, 0.0, 1.0], "omega": omega,
                "cellZone": "all",
                "rotatingPatches": ["ymin", "ymax"]},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": uin},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "ymax": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": P0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "T": {"xmin": {"type": "fixedValue", "value": T0},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [0.0, 0.0, 0.0], "p": P0, "T": T0},
        "primalMinResTol": 1e-8,
        "primalMaxIters": 6000,
        "primalVarBounds": {"pMin": 1e4, "pMax": 1e6,
                            "TMin": 100.0, "TMax": 1000.0},
        "relaxationFactors": {"fields": {"p": 0.1, "rho": 0.3},
                              "equations": {"U": 0.3, "T": 0.5}},
        "function": {
            "TTR": {"type": "totalTemperatureRatio",
                    "patches": ["xmin", "xmax"],
                    "inletPatches": ["xmin"], "outletPatches": ["xmax"],
                    "scale": 1.0},
            "MFR": {"type": "massFlowRate", "patches": ["xmax"],
                    "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 1500,
                         "gmresMaxIters": 1500, "pcType": "segregated"},
        "normalizeStates": {"U": UIN, "p": P0, "T": T0, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    inputs["params"]["MRF"] = {"omega": jnp.asarray(omega, solver.dtype)}
    return solver, inputs


@pytest.fixture(scope="module")
def converged():
    solver, inputs = make_case()
    st, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, st, info


def test_turbo_primal(converged):
    solver, inputs, st, info = converged
    assert bool(info.converged), (float(info.max_res), int(info.iters))
    # azimuthal through-flow, bounded by inlet/core speeds (the walls at
    # wheel speed ~ Omega*r = 8-8.5 m/s drag the 30 m/s flow down near
    # the walls, the core accelerates to conserve mass)
    cc = np.asarray(solver.geometry(inputs).cc)
    U = np.asarray(st["U"])
    r = np.hypot(cc[:, 0], cc[:, 1])
    uth = (-U[:, 0] * cc[:, 1] + U[:, 1] * cc[:, 0]) / r
    half = cc[:, 0] < cc[:, 1]  # downstream half of the bend
    assert 0.5 * UIN < uth[half].mean() < 1.5 * UIN
    # positive through-flow
    mfr = float(solver.run_function("MFR", st, inputs))
    assert mfr > 0.0
    # adiabatic walls + no shaft-work term in the energy equation: the
    # discrete total enthalpy (CpT + K transport) is conserved along the
    # passage, so the mass-flow-averaged total-temperature ratio is 1 to
    # discretization error — a conservation property check
    ttr = float(solver.run_function("TTR", st, inputs))
    assert ttr == pytest.approx(1.0, abs=1e-6)


def test_turbo_omega_adjoint_vs_fd(converged):
    """dJ/dOmega for the rotation speed (the differentiable-omega
    capability the reference forked MRFZone for): the co-rotating walls
    pump against the pressure gradient, so the through-flow responds
    strongly to omega (measured dMFR/dOmega ~ -1e-3 s*kg/rad)."""
    solver, inputs, st, info = converged
    psi, ai = solver.run_adjoint("MFR", st, inputs)
    assert float(ai.resid) < 1e-8 * float(ai.resid0) + 1e-14
    tot = solver.run_totals("MFR", st, inputs, psi)
    g = float(np.asarray(tot["params"]["MRF"]["omega"]))

    def run(om):
        i2 = jax.tree_util.tree_map(lambda x: x, inputs)
        i2["params"]["MRF"] = {"omega": jnp.asarray(om, solver.dtype)}
        st2, inf2 = solver.run_primal(solver.init_state(), i2)
        assert bool(inf2.converged)
        return float(solver.run_function("MFR", st2, i2))

    h = 0.05 * OMEGA
    fd = (run(OMEGA + h) - run(OMEGA - h)) / (2 * h)
    assert abs(g) > 1e-5  # omega genuinely couples into the objective
    assert g == pytest.approx(fd, rel=2e-3), (g, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46)
    dx = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dx["params"] = dict(dx["params"],
                        MRF={"omega": jnp.ones((), solver.dtype)})
    dJ_fwd, _ = solver.forward_total_derivative(st, inputs, "MFR", dx)
    assert g == pytest.approx(float(dJ_fwd), rel=1e-6), (g, float(dJ_fwd))
