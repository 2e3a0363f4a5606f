"""Jacobian dumps for offline inspection (reference writeJacobians).

The reference's `writeJacobians` option (DAOption; used from
DASolver::writeAdjointFields-era debug paths) dumps dRdWT and the
preconditioner matrix in PETSc binary so a developer can inspect
conditioning/row-sums offline. The dafoam_tpu analog dumps npz:

- ``dRdWT``: transposed Jacobian of the packed residual vector w.r.t.
  the packed state on the SAME operator the adjoint FGMRES applies by
  default (``normalized=True``): the normalizeResiduals-scaled residual
  (``solver._norm_residuals``, base.py) with the ``normalizeStates``
  diagonal scaling of adjoint_solve applied on both sides — so what you
  inspect IS what FGMRES sees. ``normalized=False`` dumps the raw
  per-equation Jacobian instead.
- per-state slot offsets so rows/cols can be mapped back to fields.

There is deliberately no sparse/assembled export of the matrix-free
operator at scale: the operator only exists as a vjp; for large cases
dump the segregated PC operators instead (they are the assembled part).
"""

import numpy as np


def dense_drdwt(solver, state, inputs, normalized=True):
    """Exact dense dRdW^T on the packed layout (small meshes only).

    normalized=True (default) differentiates the scaled adjoint operator
    D_W dR~/dW^T D_R^-1 (R~ = _norm_residuals, D from normalizeStates) —
    the matrix FGMRES actually sees in adjoint_solve. normalized=False
    differentiates raw ``solver.residuals``.
    """
    import jax
    import jax.numpy as jnp

    layout = solver.layout

    if normalized:
        geom = solver.geometry(inputs)
        scales = solver.state_scales(geom)
        s_flat = layout.pack({k: jnp.broadcast_to(jnp.asarray(scales[k]),
                                                  state[k].shape)
                              for k in layout.info.names()})
        res_fn = solver._norm_residuals
    else:
        s_flat = None
        res_fn = solver.residuals

    def res_flat(w):
        st = layout.unpack(w)
        # carry non-layout state entries (e.g. model old-time dicts)
        for k, v in state.items():
            if k not in st:
                st[k] = v
        r = res_fn(st, inputs)
        return layout.pack(r)

    w0 = layout.pack(state)
    n = int(w0.shape[0])

    # lax.map (sequential, traced once) instead of jacfwd: the scatter-free
    # FV core's linear_call primitives have custom transposes but no
    # batching rule, so vmap-of-jvp cannot trace them. One-hot tangents are
    # built inside the mapped function (a jnp.eye(n) basis would double the
    # peak memory of an already-dense dump).
    def col(i):
        e = jnp.zeros((n,), w0.dtype).at[i].set(1.0)
        return jax.jvp(res_flat, (w0,), (e,))[1]

    cols = jax.lax.map(col, jnp.arange(n))
    J = np.asarray(cols)              # row i = dR/dw_i  ==  dRdW^T
    if normalized:
        s = np.asarray(s_flat)
        # scaled operator: D_W J^T D_R^-1; with J^T stored row-major as
        # J[i, j] = dR_j/dw_i, that is s[i] * J[i, j] / s[j]
        J = (s[:, None] * J) / s[None, :]
    return J


def write_jacobians(path, solver, state, inputs, dense_limit=20000,
                    normalized=True):
    """Dump dRdWT (+ layout metadata) to ``path`` (.npz).

    Refuses the dense path above ``dense_limit`` packed DOFs — at that
    size use the assembled PC matrices or a matvec probe instead.
    """
    layout = solver.layout
    n = int(layout.pack(solver.init_state()).shape[0])
    if n > dense_limit:
        raise ValueError(
            f"packed state has {n} DOFs > dense_limit={dense_limit}; "
            "dense Jacobian dump is a small-case debug tool")
    J = dense_drdwt(solver, state, inputs, normalized=normalized)
    meta = {}
    off = 0
    zeros = layout.unpack(layout.pack(solver.init_state()))
    for name in layout.info.names():
        sz = int(zeros[name].size)
        meta[f"offset_{name}"] = off
        meta[f"size_{name}"] = sz
        off += sz
    np.savez_compressed(path, dRdWT=J, n_dof=n,
                        normalized=bool(normalized), **meta)
    return J
