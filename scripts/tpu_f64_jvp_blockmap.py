"""f64-on-TPU NaN localization, stage 2: per-INPUT-block jvp map.

tpu_f64_vjp_bisect showed every vjp seed NaNs the p and nuTilda gradient
blocks, and the full-state jvp NaNs the p/nuTilda/phi residual rows. This
probe seeds jvp one input block at a time (and, within U, one component
at a time) to localize which dR/dW column blocks carry the NaN, plus jvps
selected SA/projection subterms directly.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

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
    rep = {"platform": jax.devices()[0].platform,
           "primal_res": float(info.max_res)}

    def finmap(tree):
        return {k: bool(jnp.all(jnp.isfinite(v))) for k, v in tree.items()}

    for key in state:
        tang = {k: (jnp.ones_like(v) if k == key else jnp.zeros_like(v))
                for k, v in state.items()}
        _, jv = jax.jvp(R, (state,), (tang,))
        rep[f"jvp[{key}]"] = finmap(jv)
    print(json.dumps(rep), flush=True)

    # subterm probes: nut, stilda/fw, UEqn assembly, projection
    geom = solver.geometry(inputs)

    def sub(name, f, x, like=None):
        t = jax.tree_util.tree_map(jnp.ones_like, x)
        try:
            _, jv = jax.jvp(f, (x,), (t,))
            leaves = jax.tree_util.tree_leaves(jv)
            ok = all(bool(jnp.all(jnp.isfinite(v))) for v in leaves)
            print(json.dumps({name: ok}), flush=True)
        except Exception as e:
            print(json.dumps({name: f"raise {type(e).__name__}: {e}"}),
                  flush=True)

    turb = solver.turb
    sub("nut(nuTilda)", lambda v: turb.nut({**state, "nuTilda": v},
                                           inputs, geom), state["nuTilda"])

    from dafoam_tpu.ops import bc, fvc
    U_bco = solver._bco_U(state["U"], inputs, geom, state["phi"])
    U_b = bc.boundary_value(U_bco, state["U"], topo)
    gradU = fvc.grad(geom, topo, state["U"], U_b)
    sub("stilda_fw(nuTilda)",
        lambda v: turb._stilda_fw({**state, "nuTilda": v}, inputs, geom,
                                  gradU)[:2], state["nuTilda"])
    sub("gradU(U)",
        lambda u: fvc.grad(geom, topo, u,
                           bc.boundary_value(
                               solver._bco_U(u, inputs, geom, state["phi"]),
                               u, topo)), state["U"])
    sub("ueqn.diag(U)",
        lambda u: solver._ueqn({**state, "U": u}, inputs, geom)[0].diag,
        state["U"])
    sub("ueqn.diag(nuTilda)",
        lambda v: solver._ueqn({**state, "nuTilda": v}, inputs,
                               geom)[0].diag, state["nuTilda"])
    sub("RU(p)",
        lambda p: R({**state, "p": p})["U"], state["p"])
    sub("RnuTilda(nuTilda)",
        lambda v: R({**state, "nuTilda": v})["nuTilda"], state["nuTilda"])
    sub("Rp(p)", lambda p: R({**state, "p": p})["p"], state["p"])
    sub("Rp(U)", lambda u: R({**state, "U": u})["p"], state["U"])


if __name__ == "__main__":
    main()
