"""Parity odds-and-ends (VERDICT r2 item 8):

- OptFuncs.findFeasibleDesign (reference mphys_dafoam.py:1107-1246)
- DAFoamVSPVolume (reference mphys_dafoam.py:1821) with a volume_fn backend
- useMeanStates / meanStatesToStates (reference pyDAFoam.py:486,
  DASolver.C:4210)
- external-model regression bridge (reference DARegression.H
  betaCompute/betaJacVecProd)
"""

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.mdo import om_shim as om
from dafoam_tpu.mdo.optfuncs import OptFuncs


class _Quad(om.ExplicitComponent):
    """con0 = x0^2 + x1, con1 = x0 - x1 (invertible toy 'CFD')."""

    def setup(self):
        self.add_input("x0", val=0.0)
        self.add_input("x1", val=0.0)
        self.add_output("con0", val=0.0)
        self.add_output("con1", val=0.0)

    def compute(self, inputs, outputs):
        x0, x1 = float(inputs["x0"][0]), float(inputs["x1"][0])
        outputs["con0"] = x0 * x0 + x1
        outputs["con1"] = x0 - x1


def test_find_feasible_design():
    model = om.Group()
    ivc = om.IndepVarComp()
    ivc.add_output("x0", val=1.0)
    ivc.add_output("x1", val=1.0)
    model.add_subsystem("dvs", ivc, promotes=["*"])
    model.add_subsystem("quad", _Quad(), promotes=["*"])
    prob = om.Problem(model)
    prob.setup()

    fns = OptFuncs({}, prob)
    ok, norm, _ = fns.findFeasibleDesign(
        ["con0", "con1"], ["x0", "x1"], targets=[5.0, 1.0],
        maxIter=20, tol=1e-8)
    assert ok and norm < 1e-8
    x0 = float(prob.get_val("x0")[0])
    x1 = float(prob.get_val("x1")[0])
    assert abs(x0 * x0 + x1 - 5.0) < 1e-6
    assert abs(x0 - x1 - 1.0) < 1e-6


def test_vsp_volume_component():
    from dafoam_tpu.mdo.vsp import DAFoamVSPVolume

    def vol_fn(vals):
        # box volume parameterized by two half-extents
        return (1.0 + vals["W:a"]) * (2.0 + vals["W:b"]) * 3.0

    comp = DAFoamVSPVolume(vsp_vars=["W:a", "W:b"], output_name="vol",
                           volume_fn=vol_fn, scaled=True, step=1e-6)
    comp.setup()
    ins = {"W:a": np.array([0.5]), "W:b": np.array([0.25])}
    outs = {"vol": np.array([0.0])}
    comp.compute(ins, outs)
    assert abs(float(np.atleast_1d(outs["vol"])[0]) - 1.0) < 1e-12  # scaled

    # FD reverse product vs analytic, scaled by reference volume
    d_in = {"W:a": np.array([0.0]), "W:b": np.array([0.0])}
    d_out = {"vol": np.array([1.0])}
    comp.compute_jacvec_product(ins, d_in, d_out, "rev")
    vref = vol_fn({"W:a": 0.5, "W:b": 0.25})
    da = (2.0 + 0.25) * 3.0 / vref
    db = (1.0 + 0.5) * 3.0 / vref
    np.testing.assert_allclose(d_in["W:a"], [da], rtol=1e-4)
    np.testing.assert_allclose(d_in["W:b"], [db], rtol=1e-4)


def test_mean_states(tmp_path):
    """useMeanStates substitutes the running mean of the vol states; on a
    convergent case the mean over the converged tail equals the final
    state to the convergence level."""
    from dafoam_tpu.mesh import box_hex_mesh
    from dafoam_tpu.solvers import make_solver

    n = 8
    pts, topo = box_hex_mesh(n, n, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty"})
    base = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.01},
        "boundaryConditions": {
            "U": {"ymax": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "ymin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "xmin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "xmax": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": [0.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 0.0, "primalMaxIters": 400,
        "primalMinIters": 400,
        "function": {"F": {"type": "force", "patches": ["ymax"],
                           "directionMode": "fixedDirection",
                           "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
    }
    s_plain = make_solver(dict(base), topo, pts)
    st_plain, _ = s_plain.run_primal(s_plain.init_state(),
                                     s_plain.make_inputs())

    s_mean = make_solver(dict(base, useMeanStates=True,
                              meanStateStart=0.5), topo, pts)
    st_mean, info = s_mean.run_primal(s_mean.init_state(),
                                      s_mean.make_inputs())
    # converged case: tail-mean == final to solver tolerance
    for k in ("U", "p"):
        np.testing.assert_allclose(np.asarray(st_mean[k]),
                                   np.asarray(st_plain[k]),
                                   rtol=0, atol=1e-5, err_msg=k)
    # phi must be the FINAL value (reference averages vol/model states
    # only, DASolver.C:4210)
    np.testing.assert_array_equal(np.asarray(st_mean["phi"]),
                                  np.asarray(st_plain["phi"]))
    # and the mean must genuinely be an average, not a copy of the final
    assert float(jnp.abs(st_mean["U"] - st_plain["U"]).max()) > 0.0


def test_external_regression_model():
    from dafoam_tpu import regression as rg

    rng = np.random.default_rng(0)

    def compute(theta, feats):
        return feats @ theta + 0.5

    def vjp(theta, feats, bar):
        return feats.T @ bar, np.outer(bar, theta)

    rg.register_external_model("lin_test", compute, vjp)
    th = jnp.asarray(rng.normal(size=(3,)))
    fe = jnp.asarray(rng.normal(size=(7, 3)))

    def f(t, x):
        return rg.external_model("lin_test", t, x).sum()

    assert abs(float(jax.jit(f)(th, fe))
               - float((fe @ th + 0.5).sum())) < 1e-12
    g = jax.grad(f, argnums=(0, 1))(th, fe)
    gt = jax.grad(lambda t, x: (x @ t + 0.5).sum(), argnums=(0, 1))(th, fe)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gt[0]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gt[1]),
                               rtol=1e-12)


def test_adj_state_ordering_cell():
    """adjStateOrdering: cell (reference pyDAFoam.py:608, DAIndex cell
    ordering): per-cell interleave of cell-based states with face states
    appended; exact roundtrip and the documented component order."""
    import jax.numpy as jnp

    from dafoam_tpu.states import StateInfo, StateLayout

    si = StateInfo(vol_vector=("U",), vol_scalar=("p",),
                   model=("nuTilda",), surface_scalar=("phi",))
    lay = StateLayout(si, 3, 4, ordering="cell")
    st = {"U": jnp.arange(9.0).reshape(3, 3), "p": jnp.arange(3.0) * 10,
          "nuTilda": jnp.arange(3.0) * 100, "phi": jnp.arange(4.0) * 1000}
    v = lay.pack(st)
    # cell 0: U0x U0y U0z p0 nuTilda0, then cell 1 ...; phi block last
    np.testing.assert_allclose(
        np.asarray(v),
        [0, 1, 2, 0, 0, 3, 4, 5, 10, 100, 6, 7, 8, 20, 200,
         0, 1000, 2000, 3000])
    st2 = lay.unpack(v)
    for k in st:
        np.testing.assert_allclose(np.asarray(st2[k]), np.asarray(st[k]))
