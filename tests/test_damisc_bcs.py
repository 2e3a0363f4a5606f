"""DAMisc special boundary conditions (reference src/adjoint/DAMisc/).

multiFreqScalar/Vector (multiFreq*FvPatchField.C), varyingVelocity(+
InletOutlet) (varyingVelocity*FvPatchVectorField.C), homTemp
(homTempFvPatchScalarField.C), wallHeatFluxTransfer / fixedWallHeatFlux
(...FvPatchScalarField.C): unit-level coefficient checks against the
reference updateCoeffs formulas, plus end-to-end adjoint derivatives of
the parametric-BC parameters (they are traced design inputs here — the
reference differentiates them through the global tape).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.mesh.geometry import compute_geometry
from dafoam_tpu.ops import bc
from dafoam_tpu.ops.core import boundary_gather
from dafoam_tpu.solvers import make_solver


@pytest.fixture(scope="module")
def mesh():
    pts, topo = box_hex_mesh(4, 3, 1, (1.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    geom = compute_geometry(jnp.asarray(pts), topo)
    return pts, topo, geom


def _patch_rows(topo, name):
    sl = topo.patch_slice(name)
    ni = topo.n_internal
    return slice(sl.start - ni, sl.stop - ni)


def test_multifreq_scalar(mesh):
    pts, topo, geom = mesh
    spec = {"xmin": {"type": "multiFreqScalar", "refValue": 1.5,
                     "amplitudes": [0.2, 0.1], "frequencies": [2.0, 5.0],
                     "phases": [0.0, 0.3]},
            "xmax": {"type": "zeroGradient"},
            "ymin": {"type": "zeroGradient"},
            "ymax": {"type": "zeroGradient"},
            "zmin": {"type": "empty"}, "zmax": {"type": "empty"}}
    psi = jnp.linspace(300.0, 310.0, topo.n_cells)
    t = 0.37
    bco = bc.coeffs(spec, {}, topo, geom, psi, rank=0, t=t)
    vals = bc.boundary_value(bco, psi, topo)
    exp = 1.5 + 0.2 * np.sin(2 * np.pi * 2.0 * t) \
        + 0.1 * np.sin(2 * np.pi * 5.0 * t + 0.3)
    assert np.allclose(np.asarray(vals)[_patch_rows(topo, "xmin")], exp,
                       atol=1e-12)


def test_multifreq_vector_endtime(mesh):
    pts, topo, geom = mesh
    spec0 = {"type": "multiFreqVector", "refValue": [2.0, 0.5, 0.0],
             "amplitudes": [0.3], "frequencies": [1.0], "phases": [0.1],
             "component": 1, "endTime": 1.0}
    spec = {"xmin": spec0,
            "xmax": {"type": "zeroGradient"},
            "ymin": {"type": "zeroGradient"},
            "ymax": {"type": "zeroGradient"},
            "zmin": {"type": "empty"}, "zmax": {"type": "empty"}}
    U = jnp.zeros((topo.n_cells, 3))
    rows = _patch_rows(topo, "xmin")
    for t, active in ((0.21, True), (3.0, False)):
        bco = bc.coeffs(spec, {}, topo, geom, U, rank=1, t=t)
        vals = np.asarray(bc.boundary_value(bco, U, topo))[rows]
        osc = 0.3 * np.sin(2 * np.pi * 1.0 * t + 0.1) if active else 0.0
        assert np.allclose(vals[:, 0], 2.0)
        assert np.allclose(vals[:, 1], 0.5 + osc, atol=1e-12)
        assert np.allclose(vals[:, 2], 0.0)


def test_varying_velocity_and_inletoutlet(mesh):
    pts, topo, geom = mesh
    prm = {"U0": 2.0, "URate": 0.5, "alpha0": 0.05, "alphaRate": 0.2,
           "flowComponent": 0, "normalComponent": 1}
    spec = {"xmin": {"type": "varyingVelocity", **prm},
            "xmax": {"type": "varyingVelocityInletOutlet", **prm},
            "ymin": {"type": "zeroGradient"},
            "ymax": {"type": "zeroGradient"},
            "zmin": {"type": "empty"}, "zmax": {"type": "empty"}}
    U = 3.0 * jnp.ones((topo.n_cells, 3))
    t = 0.8
    # xmax outflow: phi_b > 0 there -> zeroGradient (value = owner cell)
    phi_b = jnp.ones((topo.n_boundary,))
    bco = bc.coeffs(spec, {}, topo, geom, U, rank=1, phi_b=phi_b, t=t)
    vals = np.asarray(bc.boundary_value(bco, U, topo))
    Ut = 2.0 + 0.5 * t
    al = 0.05 + 0.2 * t
    r_in = _patch_rows(topo, "xmin")
    assert np.allclose(vals[r_in, 0], Ut * np.cos(al), atol=1e-12)
    assert np.allclose(vals[r_in, 1], Ut * np.sin(al), atol=1e-12)
    r_out = _patch_rows(topo, "xmax")
    assert np.allclose(vals[r_out], 3.0)  # outflow -> owner value
    # reversed flux: the InletOutlet patch clamps to the varying value
    bco2 = bc.coeffs(spec, {}, topo, geom, U, rank=1, phi_b=-phi_b, t=t)
    vals2 = np.asarray(bc.boundary_value(bco2, U, topo))
    assert np.allclose(vals2[r_out, 0], Ut * np.cos(al), atol=1e-12)


def test_homtemp_wallheatflux(mesh):
    pts, topo, geom = mesh
    spec = {"xmin": {"type": "homTemp", "kS": 10.0, "kF": 0.5,
                     "solidThickness": 0.02, "baseTemperature": 350.0},
            "xmax": {"type": "wallHeatFluxTransfer", "h": 25.0,
                     "Ta": 280.0, "kappa": 2.0},
            "ymin": {"type": "fixedWallHeatFlux", "heatFlux": 100.0,
                     "alphaCpEff": 40.0},
            "ymax": {"type": "zeroGradient"},
            "zmin": {"type": "empty"}, "zmax": {"type": "empty"}}
    T = jnp.linspace(290.0, 330.0, topo.n_cells)
    bco = bc.coeffs(spec, {}, topo, geom, T, rank=0)
    vals = np.asarray(bc.boundary_value(bco, T, topo))
    grads = np.asarray(bc.boundary_sngrad(bco, T, topo))
    ni = topo.n_internal
    dc = np.asarray(geom.delta_coeffs[ni:])
    Towner = np.asarray(boundary_gather(T, topo))

    # homTemp: T_f = (Tbase + C*T_cell)/(1+C), C = kF/kS*th*dc
    r = _patch_rows(topo, "xmin")
    C = 0.5 / 10.0 * 0.02 * dc[r]
    assert np.allclose(vals[r], (350.0 + C * Towner[r]) / (1 + C),
                       rtol=1e-12)

    # wallHeatFluxTransfer: mixed with vf = h/(h+kappa*dc), refValue=Ta
    r = _patch_rows(topo, "xmax")
    vf = 25.0 / (25.0 + 2.0 * dc[r])
    assert np.allclose(vals[r], vf * 280.0 + (1 - vf) * Towner[r],
                       rtol=1e-12)
    # energy balance: kappa*snGrad == h*(Ta - T_f) (continuity of flux)
    lhs = 2.0 * grads[r]
    rhs = 25.0 * (280.0 - vals[r])
    assert np.allclose(lhs, rhs, rtol=1e-10)

    # fixedWallHeatFlux: snGrad == q/alphaCpEff
    r = _patch_rows(topo, "ymin")
    assert np.allclose(grads[r], 100.0 / 40.0, rtol=1e-12)


# ---------------------------------------------------------------------------
# end-to-end: parametric BC params as adjoint design variables
# ---------------------------------------------------------------------------
def test_varying_velocity_steady_adjoint():
    pts, topo = box_hex_mesh(8, 6, 1, (2.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]

    def build(U0):
        opts = {
            "solverName": "DASimpleFoam",
            "turbulenceModel": "None",
            "transportProperties": {"nu": 0.05},
            "boundaryConditions": {
                "U": {"xmin": {"type": "varyingVelocity", "U0": U0,
                               "URate": 0.0, "alpha0": 0.1,
                               "alphaRate": 0.0, "flowComponent": 0,
                               "normalComponent": 1},
                      "xmax": {"type": "zeroGradient"},
                      "ymin": {"type": "fixedValue", "value": zero},
                      "ymax": {"type": "fixedValue", "value": zero}},
                "p": {"xmin": {"type": "zeroGradient"},
                      "xmax": {"type": "fixedValue", "value": 0.0},
                      "ymin": {"type": "zeroGradient"},
                      "ymax": {"type": "zeroGradient"}},
            },
            "initialFields": {"U": zero, "p": 0.0},
            "primalMinResTol": 1e-11, "primalMaxIters": 600,
            "relaxationFactors": {"fields": {"p": 0.3},
                                  "equations": {"U": 0.7}},
            "function": {
                "wallF": {"type": "force", "patches": ["ymin"],
                          "directionMode": "fixedDirection",
                          "direction": [1.0, 0.0, 0.0], "scale": 1.0},
            },
            "adjEqnOption": {"gmresRelTol": 1e-12, "gmresRestart": 200,
                             "gmresMaxIters": 2000},
            "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
        }
        solver = make_solver(opts, topo, pts)
        return solver, solver.make_inputs()

    U0 = 1.0
    solver, inputs = build(U0)
    # the parametric-BC params surface as traced inputs
    assert "U0" in inputs["bc"]["U"]["xmin"]
    st, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    psi, ai = solver.run_adjoint("wallF", st, inputs)
    tot = solver.run_totals("wallF", st, inputs, psi)
    dJdU0 = float(np.asarray(tot["bc"]["U"]["xmin"]["U0"]))

    def run(u0):
        s2, i2 = build(u0)
        st2, inf2 = s2.run_primal(s2.init_state(), i2)
        assert bool(inf2.converged)
        return float(s2.run_function("wallF", st2, i2))

    h = 1e-4
    fd = (run(U0 + h) - run(U0 - h)) / (2 * h)
    assert dJdU0 == pytest.approx(fd, rel=2e-6)


def test_multifreq_pimple_unsteady_adjoint():
    pts, topo = box_hex_mesh(6, 4, 1, (1.0, 0.6, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    amp = 0.4

    def build(a):
        opts = {
            "solverName": "DAPimpleFoam",
            "turbulenceModel": "None",
            "transportProperties": {"nu": 0.05},
            "boundaryConditions": {
                "U": {"xmin": {"type": "multiFreqVector",
                               "refValue": [1.0, 0.0, 0.0],
                               "amplitudes": [a], "frequencies": [2.5],
                               "phases": [0.0], "component": 0},
                      "xmax": {"type": "zeroGradient"},
                      "ymin": {"type": "fixedValue", "value": zero},
                      "ymax": {"type": "fixedValue", "value": zero}},
                "p": {"xmin": {"type": "zeroGradient"},
                      "xmax": {"type": "fixedValue", "value": 0.0},
                      "ymin": {"type": "zeroGradient"},
                      "ymax": {"type": "zeroGradient"}},
            },
            "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0},
            "deltaT": 0.02, "endTime": 0.2,
            "pimple": {"nOuterCorrectors": 4, "nCorrectors": 2},
            "function": {
                "wallF": {"type": "force", "patches": ["ymin"],
                          "directionMode": "fixedDirection",
                          "direction": [1.0, 0.0, 0.0], "scale": 1.0,
                          "timeOp": "average"},
            },
            "adjEqnOption": {"gmresRelTol": 1e-12, "gmresRestart": 200,
                             "gmresMaxIters": 2000},
            "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
        }
        solver = make_solver(opts, topo, pts)
        return solver, solver.make_inputs()

    solver, inputs = build(amp)
    stT, hist = solver.solve_primal_history(solver.init_state(), inputs)
    # the inlet actually oscillates in time: the x-velocity boundary
    # value differs between steps (t-dependence is live inside the scan)
    u_in_owner = np.asarray(hist["U"])[:, :, 0]
    sl = topo.patch_slice("xmin")
    own = np.asarray(topo.owner[sl.start:sl.stop])
    assert np.std(u_in_owner[1:, own].mean(axis=1)) > 1e-3

    dJda, resids = solver.solve_unsteady_adjoint(hist, inputs, "wallF")
    assert np.asarray(resids).max() < 1e-9
    g = float(np.asarray(dJda["bc"]["U"]["xmin"]["amplitudes"])[0])

    def run(a):
        s2, i2 = build(a)
        _, h2 = s2.solve_primal_history(s2.init_state(), i2)
        return float(s2.eval_function_history("wallF", h2, i2)[0])

    h = 1e-3
    fd = (run(amp + h) - run(amp - h)) / (2 * h)
    assert g == pytest.approx(fd, rel=5e-5)
