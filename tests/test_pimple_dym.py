"""DAPimpleDyMFoam: ALE moving-mesh PIMPLE — mesh-flux space conservation
and the moving-mesh unsteady adjoint vs FD on the motion amplitude
(reference src/adjoint/DASolver/DAPimpleDyMFoam/DAPimpleDyMFoam.C + the
per-step mesh-point reverse sweep, pyDAFoam.py:1288)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.mesh.geometry import compute_geometry
from dafoam_tpu.solvers import make_solver

AMP = 0.02
FREQ = 2.0
DT = 0.05
NSTEP = 5


def plunging_channel():
    pts, topo = box_hex_mesh(12, 6, 1, (1.0, 0.2, 0.02),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DAPimpleDyMFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 1e-3},
        "dynamicMesh": {"active": True, "motionType": "translation",
                        "amplitude": AMP, "frequency": FREQ,
                        "direction": [0.0, 1.0, 0.0],
                        "movingPatches": ["ymin", "ymax"]},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "fixedValue", "value": zero}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0},
        "deltaT": DT, "endTime": DT * NSTEP,
        "pimple": {"nOuterCorrectors": 6, "nCorrectors": 2},
        "primalLinearSolver": {"pMaxIters": 400, "pRelTol": 1e-12,
                               "uMaxIters": 200, "uRelTol": 1e-12,
                               "turbMaxIters": 100,
                               "turbRelTol": 1e-11},
        "function": {"wallFx": {"type": "force", "patches": ["ymin"],
                                "directionMode": "fixedDirection",
                                "direction": [1.0, 0.0, 0.0],
                                "scale": 1.0, "timeOp": "average"}},
        "adjEqnOption": {"gmresRelTol": 1e-11, "gmresRestart": 200,
                         "gmresMaxIters": 2000, "pcType": "none"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs(), topo, pts


@pytest.fixture(scope="module")
def case():
    solver, inputs, topo, pts = plunging_channel()
    stT, hist = jax.jit(solver.solve_primal_history)(
        solver.init_state(), inputs)
    return solver, inputs, topo, pts, stT, hist


def test_mesh_flux_space_conservation(case):
    """Rigid translation: cell volumes are constant, so the swept-volume
    fluxes must sum to (V_new - V_old)/dt = 0 per cell (discrete SCL)."""
    solver, inputs, topo, pts, stT, hist = case
    t0, t1 = 0.3 * DT, 1.7 * DT
    p0 = solver.points_at(inputs, t0)
    p1 = solver.points_at(inputs, t1)
    mphi = solver.mesh_phi(p0, p1, t1 - t0)
    from dafoam_tpu.ops import fvc
    geom = compute_geometry(p1, topo)
    div_mphi = np.asarray(fvc.div_surface(geom, topo, mphi))
    # scale: mesh velocity * face area / cell volume ~ O(1)
    assert np.abs(div_mphi).max() < 1e-10
    # per-face flux equals Sf . v_mesh exactly for translation
    _, vel = solver.motion(inputs, 0.5 * (t0 + t1))
    # midpoint velocity differs from the mean over [t0,t1]; use the exact
    # mean displacement / dt instead
    d0, _ = solver.motion(inputs, t0)
    d1, _ = solver.motion(inputs, t1)
    vbar = (np.asarray(d1[0]) - np.asarray(d0[0])) / (t1 - t0)
    expect = np.asarray(geom.sf) @ vbar
    np.testing.assert_allclose(np.asarray(mphi), expect, atol=1e-12)


def test_dym_primal_runs(case):
    solver, inputs, topo, pts, stT, hist = case
    assert bool(solver.states_valid(stT))
    J, vals = solver.eval_function_history("wallFx", hist, inputs)
    assert np.isfinite(float(J))
    # the flow actually feels the motion: per-step function varies
    v = np.asarray(vals)
    assert v.std() > 1e-8 * max(1.0, np.abs(v).max())


def test_dym_adjoint_amplitude_vs_fd(case):
    """dJ/d(plunge amplitude) through the time-dependent reverse sweep vs
    central FD of the whole unsteady primal."""
    solver, inputs, topo, pts, stT, hist = case
    totals, resids = solver.solve_unsteady_adjoint(hist, inputs, "wallFx")
    damp = float(totals["params"]["dyMeshAmp"])

    def runJ(amp):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["dyMeshAmp"] = jnp.asarray(amp, solver.dtype)
        _, h = jax.jit(solver.solve_primal_history)(
            solver.init_state(), inp)
        J, _ = solver.eval_function_history("wallFx", h, inp)
        return float(J)

    eps = 1e-6
    fd = (runJ(AMP + eps) - runJ(AMP - eps)) / (2 * eps)
    assert abs(damp) > 1e-10            # motion sensitivity is non-trivial
    assert damp == pytest.approx(fd, rel=2e-3), (damp, fd)

    # forward-AD triangulation (reference testFuncs.py:34-46): jvp of the
    # moving-mesh time loop
    def J_of_amp(amp):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["dyMeshAmp"] = amp
        _, h = solver.solve_primal_history(solver.init_state(), inp)
        return solver.eval_function_history("wallFx", h, inp)[0]

    _, dJ_fwd = jax.jvp(J_of_amp, (inputs["params"]["dyMeshAmp"],),
                        (jnp.ones((), solver.dtype),))
    # per-step-convergence-limited: convergence-scaled bound
    # (tests/convbar.py), capped at the historical 1e-5
    from convbar import last_step_residual, rel_bar
    res = last_step_residual(solver, stT, hist, inputs, n=NSTEP, dym=True)
    bar = rel_bar(res, solver.dtype, cap=1e-5)
    assert damp == pytest.approx(float(dJ_fwd), rel=bar), \
        (damp, float(dJ_fwd), res, bar)
