"""Localize the f64-on-TPU adjoint NaN (tpu_grad_parity.py GRADPAR_X64=1).

On the TPU backend with jax_enable_x64, the NACA primal converges and
matches CPU f64 to ~1e-11, but run_adjoint returns NaN. This probe runs
the pieces separately at the converged state and reports which one first
produces a non-finite value:
  1. dJ/dW seed
  2. one dR/dW^T v product (the vjp closure FGMRES applies)
  3. the segregated PC application
  4. the FGMRES solve with pcType=none
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np  # noqa: F401

    from scripts.tpu_grad_parity import NU  # noqa: F401 (same case)
    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.solvers import make_solver

    pts, topo = omesh_naca0012(n_wrap=48, n_radial=16, radius=15.0,
                               first_cell=4e-3)
    uinf = [1.0, 0.0, 0.0]
    nu = 1e-3
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
        "primalMinResTol": 1e-10, "primalMaxIters": 1000,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "primalLinearSolver": {"pMaxIters": 200, "pRelTol": 0.02,
                               "uMaxIters": 50, "uRelTol": 0.05,
                               "turbMaxIters": 50, "turbRelTol": 0.05},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "adjEqnOption": {"gmresRelTol": 1e-9, "gmresRestart": 60,
                         "gmresMaxIters": 60, "pcType": "none"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    state, info = solver.run_primal(solver.init_state(), inputs)
    rep = {"platform": jax.devices()[0].platform,
           "primal_iters": int(info.iters),
           "primal_res": float(info.max_res)}

    def finite(tree):
        return all(bool(jnp.all(jnp.isfinite(v)))
                   for v in jax.tree_util.tree_leaves(tree))

    # 1. dJ/dW
    J = lambda w: solver.eval_function("CD", w, inputs)  # noqa: E731
    try:
        gW = jax.grad(J)(state)
        rep["dJdW_finite"] = finite(gW)
    except Exception as e:  # pragma: no cover
        rep["dJdW_finite"] = f"raise: {e}"

    # 2. one transposed-Jacobian product on a ones vector
    _, f_vjp = jax.vjp(lambda w: solver.residuals(w, inputs), state)
    ones = jax.tree_util.tree_map(jnp.ones_like,
                                  solver.residuals(state, inputs))
    (jt,) = f_vjp(ones)
    rep["JTv_finite"] = finite(jt)

    # 3/4. unpreconditioned FGMRES (pcType=none above)
    psi, ai = solver.run_adjoint("CD", state, inputs)
    rep["gmres_nopc_finite"] = finite(psi)
    rep["gmres_nopc_res"] = float(ai.resid)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
