"""Field inversion / data-driven turbulence modeling end-to-end.

The reference's headline ML workflow (DARegression + betaFI field input +
DAFunctionVariance; runRegTests_DAPimpleFoamField.py): a neural network
beta(features) multiplies the SA production term, and its parameters are
trained to minimize the misfit between the solved velocity field and
reference data, with gradients from the adjoint.

Here the "truth" data is synthesized by solving the same channel with a
prescribed non-uniform betaFI field; the NN then recovers a beta that
reproduces the data. Runs on CPU float64 in a couple of minutes.

    python examples/field_inversion_sa.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NU = 1e-4


def build(with_nn):
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
        "initialFields": {"U": [1.0, 0.0, 0.0], "p": 0.0,
                          "nuTilda": 3 * NU},
        "primalMinResTol": 1e-10,
        "primalMaxIters": 1000,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {
            "UVar": {"type": "variance", "varName": "U", "mode": "field",
                     "components": [0, 1], "scale": 1.0},
        },
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 300,
                         "gmresMaxIters": 2000, "pcType": "segregated"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * NU},
    }
    if with_nn:
        opts["regressionModel"] = {
            "active": True,
            "model1": {"modelType": "neuralNetwork",
                       "inputNames": ["VoS", "chiSA", "pGradStream"],
                       "hiddenLayerNeurons": [4],
                       "activationFunction": "tanh",
                       "outputShift": 1.0},
        }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    return solver, inputs, topo


def main():
    # ---- synthesize truth: prescribed betaFI bump in the channel core ---
    solver_t, inputs_t, topo = build(with_nn=False)
    cc = np.asarray(solver_t.geometry(inputs_t).cc)
    beta_true = 1.0 + 0.4 * np.exp(-((cc[:, 1] - 0.05) / 0.03) ** 2)
    inputs_t["params"]["betaFI"] = jnp.asarray(beta_true, solver_t.dtype)
    st_t, info_t = solver_t.run_primal(solver_t.init_state(), inputs_t)
    assert bool(info_t.converged), "truth primal did not converge"
    u_data = st_t["U"]
    print(f"truth case converged ({int(info_t.iters)} iters); "
          f"beta in [{beta_true.min():.3f}, {beta_true.max():.3f}]")

    # ---- inverse problem: NN beta trained on the velocity data ----------
    solver, inputs, _ = build(with_nn=True)
    inputs["data"] = {"UData": u_data}
    n_theta = solver.regression_n_params("model1")
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(0.0, 0.02, n_theta), solver.dtype)

    lr = 2.0e-2
    m = jnp.zeros_like(theta)  # momentum
    state = solver.init_state()
    hist = []
    for it in range(10):
        inputs["params"]["regressionPar"] = {"model1": theta}
        state, info = solver.run_primal(state, inputs)
        if not bool(info.converged):
            # resetStateVals analog: restart from scratch once
            state, info = solver.run_primal(solver.init_state(), inputs)
        J = float(solver.run_function("UVar", state, inputs))
        psi, ai = solver.run_adjoint("UVar", state, inputs)
        tot = solver.run_totals("UVar", state, inputs, psi)
        g = tot["params"]["regressionPar"]["model1"]
        m = 0.7 * m + g
        theta = theta - lr * m / (jnp.linalg.norm(g) + 1e-30)
        hist.append(J)
        print(f"iter {it:2d}: UVar misfit = {J:.6e}  "
              f"|g_theta| = {float(jnp.linalg.norm(g)):.3e}")

    assert hist[-1] < 0.5 * hist[0], (
        f"field inversion failed to reduce misfit: {hist[0]:.3e} -> "
        f"{hist[-1]:.3e}")
    print(f"misfit reduced {hist[0]:.3e} -> {hist[-1]:.3e} "
          f"({hist[-1] / hist[0]:.1%})")


if __name__ == "__main__":
    main()
