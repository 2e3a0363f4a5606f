"""kOmegaSSTLM transition model: flat-plate-style channel primal +
adjoint vs FD (reference DAkOmegaSSTLM parity — four model states in the
adjoint vector, gamma-ReThetat transition physics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver

NU = 2e-5
UIN = 1.0
TU_IN = 0.03          # 3% freestream turbulence -> bypass transition regime
KIN = 1.5 * (TU_IN * UIN) ** 2
WIN = 400.0
RET_IN = 200.0        # freestream ReThetat for Tu=3%


def plate():
    # near-wall-refined half-channel over a flat plate (ymin wall)
    pts, topo = box_hex_mesh(20, 10, 1, (1.0, 0.08, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall"},
                             grading=(None, 4.0, None))
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "kOmegaSSTLM",
        "transportProperties": {"nu": NU},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [UIN, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "zeroGradient"}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
            "k": {"xmin": {"type": "fixedValue", "value": KIN},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": 1e-10},
                  "ymax": {"type": "zeroGradient"}},
            "omega": {"xmin": {"type": "fixedValue", "value": WIN},
                      "xmax": {"type": "zeroGradient"},
                      "ymin": {"type": "fixedValue", "value": 1.5e5},
                      "ymax": {"type": "zeroGradient"}},
            "ReThetat": {"xmin": {"type": "fixedValue", "value": RET_IN},
                         "xmax": {"type": "zeroGradient"},
                         "ymin": {"type": "zeroGradient"},
                         "ymax": {"type": "zeroGradient"}},
            "gammaInt": {"xmin": {"type": "fixedValue", "value": 1.0},
                         "xmax": {"type": "zeroGradient"},
                         "ymin": {"type": "zeroGradient"},
                         "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": [UIN, 0.0, 0.0], "p": 0.0, "k": KIN,
                          "omega": WIN, "ReThetat": RET_IN, "gammaInt": 1.0},
        "primalMinResTol": 5e-8,
        "primalMaxIters": 2000,
        "relaxationFactors": {"fields": {"p": 0.2},
                              "equations": {"U": 0.5, "nuTilda": 0.5}},
        "function": {
            "drag": {"type": "force", "patches": ["ymin"],
                     "directionMode": "fixedDirection",
                     "direction": [1.0, 0.0, 0.0], "scale": 1.0},
        },
        # unrestarted GMRES: with restart 300 this stiff adjoint sits on
        # the restart-stagnation edge (converges or stalls depending on
        # sub-ulp compilation differences between runs)
        "adjEqnOption": {"gmresRelTol": 1e-10, "gmresRestart": 3000,
                         "gmresMaxIters": 3000, "pcType": "segregated"},
        "normalizeStates": {"U": UIN, "p": 0.5, "phi": 1.0, "k": KIN,
                            "omega": WIN, "ReThetat": RET_IN,
                            "gammaInt": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


@pytest.fixture(scope="module")
def case():
    solver, inputs = plate()
    state, info = solver.run_primal(solver.init_state(), inputs)
    return solver, inputs, state, info


def test_sstlm_primal(case):
    solver, inputs, state, info = case
    assert not bool(info.failed)
    assert float(info.max_res) < 1e-5, float(info.max_res)
    gam = np.asarray(state["gammaInt"])
    ret = np.asarray(state["ReThetat"])
    assert (gam >= 0.0).all() and (gam <= 1.0 + 1e-6).all()
    assert (ret >= 20.0).all()
    # the model is active: intermittency is NOT uniformly 1 (near-wall
    # upstream cells stay (partially) laminar at this plate Reynolds)
    assert gam.min() < 0.9
    # consistency of the 4 model residuals at the converged state
    r = solver.residuals(state, inputs)
    for name in ("k", "omega", "ReThetat", "gammaInt"):
        assert np.abs(np.asarray(r[name])).max() < 1e-4, name


def test_sstlm_correlations():
    """Empirical correlations against hand-evaluated reference values
    (DAkOmegaSSTLM.C:393-585)."""
    from dafoam_tpu.models.komega_sst_lm import KOmegaSSTLM

    # ReThetac piecewise: continuity near the 1870 switch
    lo = float(KOmegaSSTLM._ReThetac(jnp.asarray(1869.999)))
    hi = float(KOmegaSSTLM._ReThetac(jnp.asarray(1870.001)))
    assert lo == pytest.approx(hi, rel=1e-3)
    # Fonset limits: Rev >> ReThetac -> capped at 2 - Fonset3
    f = float(KOmegaSSTLM._Fonset(jnp.asarray(1e6), jnp.asarray(100.0),
                                  jnp.asarray(10.0)))
    assert f == pytest.approx(2.0)
    # ReThetat0: zero pressure gradient, Tu=3% -> theta from the Tu>1.3
    # branch with Flambda=1: ReThetat0 = 331.5*(Tu-0.5658)^-0.671
    v = float(KOmegaSSTLM._ReThetat0(jnp.asarray(3.0), jnp.asarray(0.0),
                                     jnp.asarray(1e-5), jnp.asarray(1.0)))
    assert v == pytest.approx(331.5 * (3.0 - 0.5658) ** -0.671, rel=1e-6)


def test_sstlm_adjoint_vs_fd(case):
    solver, inputs, state, info = case
    psi, ai = solver.run_adjoint("drag", state, inputs)
    # the gammaInt equation (sqrt onset production, ce2=50 sink) makes this
    # the stiffest adjoint in the suite: require a 1e-2 relative drop and
    # lock accuracy on the FD oracle below
    assert float(ai.resid) < 2e-2 * float(ai.resid0)
    tot = solver.run_totals("drag", state, inputs, psi)
    dnu = float(tot["params"]["nu"])

    def runJ(nu):
        inp = jax.tree_util.tree_map(lambda x: x, inputs)
        inp["params"]["nu"] = jnp.asarray(nu, solver.dtype)
        st, _ = solver.run_primal(solver.init_state(), inp)
        return float(solver.run_function("drag", st, inp))

    eps = 1e-9
    fd = (runJ(NU + eps) - runJ(NU - eps)) / (2 * eps)
    assert dnu == pytest.approx(fd, rel=7e-3), (dnu, fd)
    # the transition states carry nonzero adjoint weight
    assert np.abs(np.asarray(psi["gammaInt"])).max() > 0
    assert np.abs(np.asarray(psi["ReThetat"])).max() > 0
