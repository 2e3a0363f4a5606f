"""Bisect the f64-on-TPU residual-vjp NaN per equation/variable.

tpu_f64_adjoint_probe.py showed: primal fine, dJ/dW fine, but
vjp(residuals)(ones) is NaN under TPU f64 emulation. Seed each residual
row-block separately and report which output (state) blocks go non-finite;
also check the forward jvp for symmetry of the failure.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from scripts.tpu_f64_adjoint_probe import __name__ as _  # noqa: F401
    # rebuild the same case inline (import would run its __main__ guard only)
    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.solvers import make_solver

    nu = 1e-3
    uinf = [1.0, 0.0, 0.0]
    pts, topo = omesh_naca0012(n_wrap=48, n_radial=16, radius=15.0,
                               first_cell=4e-3)
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
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    state, info = solver.run_primal(solver.init_state(), inputs)

    R = lambda w: solver.residuals(w, inputs)  # noqa: E731
    r0 = R(state)
    _, f_vjp = jax.vjp(R, state)

    rep = {"platform": jax.devices()[0].platform,
           "primal_res": float(info.max_res)}

    def finmap(tree):
        return {k: bool(jnp.all(jnp.isfinite(v))) for k, v in tree.items()}

    rep["residual_finite"] = finmap(r0)
    for seed_key in r0:
        seed = {k: (jnp.ones_like(v) if k == seed_key
                    else jnp.zeros_like(v)) for k, v in r0.items()}
        (g,) = f_vjp(seed)
        rep[f"vjp[{seed_key}]"] = finmap(g)

    # forward mode for comparison
    tang = jax.tree_util.tree_map(jnp.ones_like, state)
    _, jv = jax.jvp(R, (state,), (tang,))
    rep["jvp_finite"] = finmap(jv)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
