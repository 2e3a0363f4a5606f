"""Field inversion / data-driven turbulence (reference DARegression +
betaFI `field` input + variance function): beta multiplies SA production;
adjoint gradients w.r.t. the beta FIELD and w.r.t. NEURAL-NET parameters
are checked against FD — the machinery behind runRegTests_DAPimpleFoamField
and runUnitTests_ExternalNN in the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu import regression
from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NU = 1e-4


def fi_channel():
    pts, topo = box_hex_mesh(12, 6, 1, (1.0, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "SpalartAllmaras",
        "transportProperties": {"nu": NU},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "fixedValue", "value": zero}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "nuTilda": {"xmin": {"type": "fixedValue", "value": 3 * NU},
                        "xmax": {"type": "zeroGradient"},
                        "ymin": {"type": "fixedValue", "value": 0.0},
                        "ymax": {"type": "fixedValue", "value": 0.0}},
        },
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0, "nuTilda": 3 * NU},
        "primalMinResTol": 1e-11,
        "primalMaxIters": 1000,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "regressionModel": {
            "active": True,
            "model1": {"modelType": "neuralNetwork",
                       "inputNames": ["VoS", "chiSA", "pGradStream"],
                       "hiddenLayerNeurons": [4],
                       "activationFunction": "tanh",
                       "outputShift": 1.0},
        },
        "function": {
            "drag": {"type": "force", "patches": ["ymin", "ymax"],
                     "directionMode": "fixedDirection",
                     "direction": [1.0, 0.0, 0.0], "scale": 1.0},
            "UVar": {"type": "variance", "varName": "U", "mode": "field",
                     "components": [0, 1], "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-11, "gmresRestart": 300,
                         "gmresMaxIters": 2000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * NU},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    n_theta = solver.regression_n_params("model1")
    rng = np.random.default_rng(3)
    theta = jnp.asarray(rng.normal(0, 0.1, n_theta), solver.dtype)
    inputs["params"]["regressionPar"] = {"model1": theta}
    inputs["params"]["betaFI"] = jnp.ones((topo.n_cells,), solver.dtype)
    return solver, inputs, topo


@pytest.fixture(scope="module")
def case():
    solver, inputs, topo = fi_channel()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, topo, state, info


def test_fi_primal_with_nn_beta(case):
    solver, inputs, topo, state, info = case
    assert bool(info.converged), (int(info.iters), float(info.max_res))
    # the NN actually modifies beta away from 1
    geom = solver.geometry(inputs)
    from dafoam_tpu.ops import bc as bcm, fvc
    U_bco = solver._bco_U(state["U"], inputs, geom, state["phi"])
    U_b = bcm.boundary_value(U_bco, state["U"], topo)
    gradU = fvc.grad(geom, topo, state["U"], U_b)
    beta = solver._compute_beta(state, inputs, geom, gradU)
    assert float(jnp.abs(beta - 1.0).max()) > 1e-4


def test_fi_gradients_vs_fd(case):
    solver, inputs, topo, state, info = case
    psi, ai = solver.run_adjoint("drag", state, inputs)
    tot = solver.run_totals("drag", state, inputs, psi)
    g_theta = np.asarray(tot["params"]["regressionPar"]["model1"])
    g_beta = np.asarray(tot["params"]["betaFI"])
    assert np.isfinite(g_theta).all() and np.isfinite(g_beta).all()
    assert np.abs(g_theta).max() > 0 and np.abs(g_beta).max() > 0

    def runJ(theta=None, bfi=None):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        if theta is not None:
            inp["params"]["regressionPar"] = {"model1": theta}
        if bfi is not None:
            inp["params"]["betaFI"] = bfi
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("drag", st, inp))

    eps = 1e-5
    th = inputs["params"]["regressionPar"]["model1"]
    i = int(np.abs(g_theta).argmax())
    fd = (runJ(theta=th.at[i].add(eps))
          - runJ(theta=th.at[i].add(-eps))) / (2 * eps)
    assert g_theta[i] == pytest.approx(fd, rel=2e-4), (g_theta[i], fd)

    b0 = inputs["params"]["betaFI"]
    j = int(np.abs(g_beta).argmax())
    # beta is an O(1) multiplier and dJ/dbeta_j ~ 1e-8: use a large FD step
    # to stay above the primal-tolerance noise floor
    eps_b = 1e-2
    fd2 = (runJ(bfi=b0.at[j].add(eps_b))
           - runJ(bfi=b0.at[j].add(-eps_b))) / (2 * eps_b)
    assert g_beta[j] == pytest.approx(fd2, rel=1e-3), (g_beta[j], fd2)
