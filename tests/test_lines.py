"""linalg/lines.py — line-implicit (ADI) approximate inverses on the
dense-DIA layout, shared by the primal pressure PC (fvsolve.solve
pc="line") and the adjoint line PC (adjoint/precond.line_solver_T)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.linalg.krylov import bicgstab, cg
from dafoam_tpu.linalg.lines import (apply_line_solve, build_line_solves,
                                     line_directions, line_solver)
from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.ops.core import face_sum_pair
from dafoam_tpu.ops.fvmatrix import FvMatrix, matvec_fn


def _dense_topo(nx, ny):
    from dafoam_tpu.mesh.topology import to_dia_dense

    pts, topo = box_hex_mesh(nx, ny, 1, (1.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    if topo.dia_dense() is None:
        dense = to_dia_dense(topo)
        assert dense is not None
        topo = dense
    return pts, topo


def _laplacian_like(topo, key):
    nc, ni = topo.n_cells, topo.n_internal
    k1, k2 = jax.random.split(key)
    low = -jnp.abs(jax.random.normal(k1, (ni,))) - 0.2
    up = -jnp.abs(jax.random.normal(k2, (ni,))) - 0.2
    diag = face_sum_pair(-up, -low, topo) + 0.3   # strictly dominant
    return FvMatrix(diag=diag, lower=low, upper=up,
                    source=jnp.zeros((nc,)))


def test_line_directions_detected():
    _, topo = _dense_topo(16, 12)
    dirs = line_directions(topo)
    assert dirs is not None and len(dirs) >= 2
    strides = sorted(d["stride"] for d in dirs)
    assert strides[0] == 1


def test_single_direction_solve_exact():
    """With every cross-direction coefficient zeroed, the matrix IS
    block-tridiagonal along one direction, and one line solve must invert
    it to machine precision."""
    _, topo = _dense_topo(16, 12)
    m = _laplacian_like(topo, jax.random.PRNGKey(0))
    dirs = line_directions(topo)
    nc = topo.n_cells
    nbands = m.upper.shape[0] // nc
    for d in dirs:
        if d["ring"] is not None:
            continue
        k = d["band"]
        keep = jnp.zeros((nbands, nc)).at[k].set(1.0).reshape(-1)
        m1 = m._replace(upper=m.upper * keep, lower=m.lower * keep)
        # rebuild dominance for the restricted matrix
        dd = face_sum_pair(-m1.upper, -m1.lower, topo) + 0.3
        m1 = m1._replace(diag=dd)
        solves = build_line_solves(m1, topo)
        entry = [e for e in solves
                 if e[0] == "line" and e[1] == d["stride"]][0]
        x = jax.random.normal(jax.random.PRNGKey(1), (nc,))
        mv = matvec_fn(m1, topo)
        r = mv(x)
        x_rec = apply_line_solve(entry, m1.diag, r)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                                   rtol=1e-10, atol=1e-12)


def test_adi_pc_beats_jacobi():
    """Full ADI line PC must cut the Krylov iteration count vs Jacobi on
    the same operator (the reason fvsolve grows pc='line')."""
    _, topo = _dense_topo(48, 40)
    m = _laplacian_like(topo, jax.random.PRNGKey(2))
    nc = topo.n_cells
    b = jax.random.normal(jax.random.PRNGKey(3), (nc,))
    mv = matvec_fn(m, topo)
    dinv = 1.0 / m.diag
    x0 = jnp.zeros_like(b)
    # lower != upper here, so the operator is ASYMMETRIC: BiCGStab both
    # sides (jacobi-CG would simply diverge)
    xj, ij = bicgstab(mv, b, x0=x0, precond=lambda r: dinv * r,
                      rel_tol=1e-10, max_iters=4000)
    assert bool(ij.converged)
    lp = line_solver(m, topo)
    assert lp is not None
    xl, il = bicgstab(mv, b, x0=x0, precond=lp, rel_tol=1e-10,
                      max_iters=4000)
    assert bool(il.converged)
    assert int(il.iters) < int(ij.iters)
    np.testing.assert_allclose(np.asarray(xl), np.asarray(xj),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("pc", ["jacobi", "line"])
def test_fvsolve_pc_option_same_solution(pc):
    """fvsolve.solve must return the same solution for either PC, and the
    implicit-function vjp must stay exact through the line-PC branch."""
    from dafoam_tpu.linalg import fvsolve

    _, topo = _dense_topo(12, 10)
    m = _laplacian_like(topo, jax.random.PRNGKey(4))
    # symmetrize (the pressure operator is symmetric; symmetric=True below)
    m = m._replace(lower=m.upper,
                   diag=face_sum_pair(-m.upper, -m.upper, topo) + 0.3)
    nc = topo.n_cells
    src = jax.random.normal(jax.random.PRNGKey(5), (nc,))
    m = m._replace(source=src)
    x0 = jnp.zeros((nc,))

    def solve_from(srcv):
        x, _ = fvsolve.solve(m._replace(source=srcv), x0, topo,
                             symmetric=True, rel_tol=1e-12, max_iters=2000,
                             pc=pc)
        return x

    x = solve_from(src)
    mv = matvec_fn(m, topo)
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(src),
                               rtol=2e-9, atol=1e-10)

    # implicit-function gradient: d(sum x)/d(src) = (M^-T) 1
    g = jax.grad(lambda s: jnp.sum(solve_from(s)))(src)
    gt, _ = fvsolve.solve(
        FvMatrix(diag=m.diag, lower=m.upper, upper=m.lower,
                 source=jnp.ones((nc,))), x0, topo, symmetric=True,
        rel_tol=1e-12, max_iters=2000)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gt),
                               rtol=5e-8, atol=1e-9)
