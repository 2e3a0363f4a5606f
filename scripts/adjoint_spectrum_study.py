"""Dense spectrum study of the scaled adjoint operator (debug tool).

Builds the exact dense D_W dR~/dW^T D_R^-1 on a small NACA case
(utils/jacdump.dense_drdwt), measures conditioning, and solves the CD
adjoint system directly + with each preconditioner applied as a dense
matrix, reporting GMRES-style convergence per PC. Ground truth for why
FGMRES stalls (VERDICT r2 item 1).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from scripts.pc_convergence_study import build


def main():
    nw, nr = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (48, 16)
    solver = build(nw, nr, "coupledLine", {"pcCoupledSweeps": 2})
    inputs = solver.make_inputs()
    state, info = solver.run_primal(solver.init_state(), inputs)
    print(f"primal iters={int(info.iters)} res={float(info.max_res):.2e}")

    from dafoam_tpu.utils.jacdump import dense_drdwt
    JT = dense_drdwt(solver, state, inputs, normalized=True)  # scaled A^T
    n = JT.shape[0]
    print(f"n_dof={n}")

    # RHS: scaled dJ/dW
    geom = solver.geometry(inputs)
    scales = solver.state_scales(geom)
    layout = solver.layout
    dJdW = jax.grad(lambda w: solver.eval_function("CD", w, inputs))(state)
    s_flat = np.asarray(layout.pack(
        {k: jnp.broadcast_to(jnp.asarray(scales[k]), state[k].shape)
         for k in layout.info.names()}))
    b = np.asarray(layout.pack(dJdW)) * s_flat

    A = JT  # the operator FGMRES applies is x -> A x with A = scaled J^T
    # direct solve
    x = np.linalg.solve(A, b)
    print(f"direct residual: {np.linalg.norm(A @ x - b) / np.linalg.norm(b):.2e}")
    svals = np.linalg.svd(A, compute_uv=False)
    print(f"sigma_max={svals[0]:.3e} sigma_min={svals[-1]:.3e} "
          f"cond={svals[0]/svals[-1]:.3e}")
    # how many tiny singular values?
    for thr in (1e-12, 1e-10, 1e-8, 1e-6, 1e-4):
        print(f"  sigma < {thr:g}: {(svals < thr).sum()}")

    # eigenvalues of preconditioned operator for each PC
    from dafoam_tpu.adjoint import solver as adjsolver

    for pctype, extra in (("segregated", None),
                          ("lineJacobi", None),
                          ("coupledLine", {"pcCoupledSweeps": 2})):
        opt = dict(solver.option["adjEqnOption"])
        opt["pcType"] = pctype
        if extra:
            opt.update(extra)
        solver.option.set("adjEqnOption", opt)
        pc = solver.make_adjoint_pc(state, inputs)
        if getattr(pc, "needs_opT", False):
            Aj = jnp.asarray(A)

            def matT(tree):
                return layout.unpack(Aj @ layout.pack(tree))
            pc = pc(matT)

        # dense PC matrix: apply pc to unit vectors
        cols = []
        for i in range(n):
            e = np.zeros(n)
            e[i] = 1.0
            cols.append(np.asarray(layout.pack(pc(layout.unpack(
                jnp.asarray(e))))))
        M = np.stack(cols, axis=1)
        AM = A @ M
        ev = np.linalg.eigvals(AM)
        # GMRES proxy: residual of best degree-k polynomial is driven by
        # eigenvalue clustering; report spread + count near zero
        print(f"{pctype}: |lam| in [{np.abs(ev).min():.3e}, "
              f"{np.abs(ev).max():.3e}]  re<0: {(ev.real < 0).sum()}/{n}  "
              f"|lam|<1e-6: {(np.abs(ev) < 1e-6).sum()}")
        # actual dense-GMRES convergence (scipy)
        try:
            from scipy.sparse.linalg import gmres as sp_gmres

            res_hist = []
            sp_gmres(AM, b, rtol=1e-8, restart=120, maxiter=5,
                     callback=lambda r: res_hist.append(float(r)),
                     callback_type="pr_norm")
            h = [f"{v:.1e}" for v in res_hist[::30]]
            print(f"   gmres(AM) pr_norm every 30 iters: {h}")
        except Exception as e:
            print("   scipy gmres unavailable:", e)


if __name__ == "__main__":
    main()
