"""writeJacobians analog (utils/jacdump.py): the dense dRdW^T dump must
agree with the matrix-free vjp operator the adjoint FGMRES actually uses
(reference writeJacobians dumps the PETSc dRdWT for the same purpose)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver
from dafoam_tpu.utils.jacdump import dense_drdwt, write_jacobians


def make_case():
    pts, topo = box_hex_mesh(5, 4, 1, (1.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    opts = {
        "solverName": "DAScalarTransportFoam",
        "ddtScheme": "steadyState",
        "transportProperties": {"DT": 0.05},
        "boundaryConditions": {
            "T": {"xmin": {"type": "fixedValue", "value": 1.0},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": 0.0},
                  "ymax": {"type": "zeroGradient"}},
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.2, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": [1.0, 0.2, 0.0]},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"T": 0.0},
        "function": {"TMean": {"type": "patchMean", "patches": ["xmax"],
                               "varName": "T", "scale": 1.0}},
        "normalizeStates": {"T": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    inputs["params"]["U"] = jnp.tile(
        jnp.asarray([1.0, 0.2, 0.0], solver.dtype), (topo.n_cells, 1))
    return solver, inputs


def test_dense_drdwt_matches_vjp(tmp_path):
    solver, inputs = make_case()
    state, info = solver.solve_primal(solver.init_state(), inputs)
    assert bool(info.converged)

    JT_raw = dense_drdwt(solver, state, inputs, normalized=False)
    JT = dense_drdwt(solver, state, inputs)   # default: the FGMRES operator
    n = JT.shape[0]
    assert JT.shape == (n, n)

    # matrix-free J^T v via the same vjp closure the adjoint uses
    layout = solver.layout
    rng = np.random.default_rng(0)
    v = rng.standard_normal(n)

    def res_flat(w):
        st = layout.unpack(w)
        for k, val in state.items():
            if k not in st:
                st[k] = val
        return layout.pack(solver.residuals(st, inputs))

    w0 = layout.pack(state)
    _, f_vjp = jax.vjp(res_flat, w0)
    (jt_v,) = f_vjp(jnp.asarray(v, solver.dtype))
    np.testing.assert_allclose(JT_raw @ v, np.asarray(jt_v),
                               rtol=1e-10, atol=1e-12)

    # the normalized dump must match the SCALED adjoint operator
    # (adjoint_solve matT: D_W d(normres)/dW^T D_R^-1)
    geom = solver.geometry(inputs)
    scales = solver.state_scales(geom)
    s_flat = layout.pack({k: jnp.broadcast_to(jnp.asarray(scales[k]),
                                              state[k].shape)
                          for k in layout.info.names()})

    def nres_flat(w):
        st = layout.unpack(w)
        for k, val in state.items():
            if k not in st:
                st[k] = val
        return layout.pack(solver._norm_residuals(st, inputs))

    _, fn_vjp = jax.vjp(nres_flat, w0)
    (jtn_v,) = fn_vjp(jnp.asarray(v, solver.dtype) / s_flat)
    np.testing.assert_allclose(JT @ v, np.asarray(jtn_v * s_flat),
                               rtol=1e-10, atol=1e-12)

    # file dump round-trip with layout metadata
    path = os.path.join(tmp_path, "jac.npz")
    write_jacobians(path, solver, state, inputs)
    dat = np.load(path)
    np.testing.assert_allclose(dat["dRdWT"], JT, rtol=0, atol=0)
    assert int(dat["n_dof"]) == n
    assert int(dat["offset_T"]) == 0 and int(dat["size_T"]) > 0
