"""Jacobian dumps for offline inspection (reference writeJacobians).

The reference's `writeJacobians` option (DAOption; used from
DASolver::writeAdjointFields-era debug paths) dumps dRdWT and the
preconditioner matrix in PETSc binary so a developer can inspect
conditioning/row-sums offline. The dafoam_tpu analog dumps npz:

- ``dRdWT`` (dense, small meshes only): exact transposed Jacobian of the
  packed residual vector w.r.t. the packed state, via ``jax.jacfwd`` on
  the same ``residuals()`` closure the adjoint uses — so what you inspect
  IS what FGMRES sees (up to state/residual normalization, which is
  applied the same way).
- per-state slot offsets so rows/cols can be mapped back to fields.

There is deliberately no sparse/assembled export of the matrix-free
operator at scale: the operator only exists as a vjp; for large cases
dump the segregated PC operators instead (they are the assembled part).
"""

import numpy as np


def dense_drdwt(solver, state, inputs):
    """Exact dense dRdW^T on the packed layout (small meshes only)."""
    import jax

    layout = solver.layout

    def res_flat(w):
        st = layout.unpack(w)
        # carry non-layout state entries (e.g. model old-time dicts)
        for k, v in state.items():
            if k not in st:
                st[k] = v
        r = solver.residuals(st, inputs)
        return layout.pack(r)

    w0 = layout.pack(state)
    # lax.map (sequential, traced once) instead of jacfwd: the scatter-free
    # FV core's linear_call primitives have custom transposes but no
    # batching rule, so vmap-of-jvp cannot trace them.
    import jax.numpy as jnp

    n = int(w0.shape[0])
    cols = jax.lax.map(lambda e: jax.jvp(res_flat, (w0,), (e,))[1],
                       jnp.eye(n, dtype=w0.dtype))
    return np.asarray(cols)  # row i = dR/dw_i  ==  dRdW^T


def write_jacobians(path, solver, state, inputs, dense_limit=20000):
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
    J = dense_drdwt(solver, state, inputs)
    meta = {}
    off = 0
    zeros = layout.unpack(layout.pack(solver.init_state()))
    for name in layout.info.names():
        sz = int(zeros[name].size)
        meta[f"offset_{name}"] = off
        meta[f"size_{name}"] = sz
        off += sz
    np.savez_compressed(path, dRdWT=J, n_dof=n, **meta)
    return J
