"""EGO surrogate optimizer + actuator-disk fvSource adjoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mdo.ego import GP, ego_minimize
from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver


def test_gp_fits_smooth_function():
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (25, 2))
    y = np.sin(2 * X[:, 0]) + X[:, 1] ** 2
    gp = GP().fit(X, y)
    Xq = rng.uniform(-0.8, 0.8, (10, 2))
    yq = np.sin(2 * Xq[:, 0]) + Xq[:, 1] ** 2
    mu, sig = gp.predict(jnp.asarray(Xq))
    assert np.abs(np.asarray(mu) - yq).max() < 0.15


def test_ego_finds_minimum():
    calls = []

    def f(x):
        calls.append(1)
        return float((x[0] - 0.3) ** 2 + (x[1] + 0.2) ** 2)

    res = ego_minimize(f, [(-1, 1), (-1, 1)], n_init=6, n_iter=10, seed=1)
    assert res["fun"] < 0.02, res["fun"]
    assert abs(res["x"][0] - 0.3) < 0.2
    assert len(calls) <= 16  # sample-efficient vs grid/random


def test_actuator_disk_adjoint_vs_fd():
    """Actuator-disk thrust in a duct; dJ/d(thrust) and dJ/d(disk x-center)
    vs FD (reference DAFvSourceActuatorDisk + DAInputFvSourcePar path)."""
    pts, topo = box_hex_mesh(16, 6, 1, (1.0, 0.2, 0.02),
                             kinds={"zmin": "empty", "zmax": "empty"})
    params0 = np.array([0.4, 0.1, 0.01,   # center
                        1.0, 0.0, 0.0,    # direction
                        0.0, 0.08, 0.1,   # innerR, outerR, thickness
                        0.002])           # total thrust
    opts = {
        "solverName": "DASimpleFoam", "turbulenceModel": "None",
        "transportProperties": {"nu": 1e-3},
        "fvSource": {"disk1": {"type": "actuatorDisk",
                               "parameters": params0.tolist(),
                               "smoothness": 0.1}},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "slip"}, "ymax": {"type": "slip"}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 1e-10, "primalMaxIters": 800,
        "relaxationFactors": {"fields": {"p": 0.3}, "equations": {"U": 0.7}},
        "function": {"pIn": {"type": "patchMean", "patches": ["xmin"],
                             "varName": "p", "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 2000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    inputs["params"]["fvSourcePar"] = {
        "disk1": jnp.asarray(params0, solver.dtype)}
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    # disk accelerates the flow -> upstream pressure rises
    J0 = float(solver.run_function("pIn", state, inputs))

    psi, ai = solver.run_adjoint("pIn", state, inputs)
    tot = solver.run_totals("pIn", state, inputs, psi)
    g = np.asarray(tot["params"]["fvSourcePar"]["disk1"])

    def runJ(par):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["fvSourcePar"] = {"disk1": jnp.asarray(par,
                                                             solver.dtype)}
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("pIn", st, inp))

    for idx, eps in ((9, 1e-6), (0, 1e-6)):  # thrust, x-center
        pp = params0.copy(); pp[idx] += eps
        pm = params0.copy(); pm[idx] -= eps
        fd = (runJ(pp) - runJ(pm)) / (2 * eps)
        assert g[idx] == pytest.approx(fd, rel=2e-4), (idx, g[idx], fd)
