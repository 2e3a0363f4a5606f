"""MDO layer: FFD parametrization, IDW mesh warping, and an actual
gradient-based shape optimization on the NACA north-star case —
the reference's DVGeo/IDWarp/OpenMDAO chain, standalone (SURVEY.md §1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mdo import FFDBox, IDWarp
from dafoam_tpu.mdo.optimize import ShapeOptProblem


def test_ffd_embedding_and_derivative():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.1, 0.9, (50, 3))
    ffd = FFDBox(pts, nx=4, ny=3, nz=2, bounds=([0, 0, 0], [1, 1, 1]))
    dcp = np.zeros((4, 3, 2, 3))
    dcp[1, 1, :, 1] = 0.1  # lift one interior-xy control point in y
    moved = np.asarray(ffd(jnp.asarray(pts), jnp.asarray(dcp)))
    d = moved - pts
    assert d[:, 1].max() > 1e-3       # points moved in y
    assert np.abs(d[:, 0]).max() < 1e-12
    # displacement is zero on the box xy-boundary faces
    edge = np.array([[0.0, 0.5, 0.5], [1.0, 0.5, 0.5],
                     [0.5, 0.0, 0.5], [0.5, 1.0, 0.5]])
    ffd2 = FFDBox(edge, nx=4, ny=3, nz=2, bounds=([0, 0, 0], [1, 1, 1]))
    d2 = np.asarray(ffd2.displace(jnp.asarray(dcp)))
    assert np.abs(d2).max() < 1e-12

    # vjp == FD
    f = lambda c: jnp.sum(ffd(jnp.asarray(pts), c) ** 2)
    g = jax.grad(f)(jnp.asarray(dcp))
    eps = 1e-6
    dp = dcp.copy(); dp[1, 1, 0, 1] += eps
    dm = dcp.copy(); dm[1, 1, 0, 1] -= eps
    fd = (float(f(jnp.asarray(dp))) - float(f(jnp.asarray(dm)))) / (2 * eps)
    assert float(g[1, 1, 0, 1]) == pytest.approx(fd, rel=1e-7)


def test_idwarp_surface_exact_fixed_frozen():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (200, 3))
    surf = np.arange(10)
    fixed = np.arange(190, 200)
    w = IDWarp(pts, surf, fixed, k=8)
    disp = rng.normal(size=(10, 3)) * 0.01
    out = np.asarray(w(jnp.asarray(pts), jnp.asarray(disp)))
    np.testing.assert_allclose(out[surf] - pts[surf], disp, atol=1e-12)
    # fixed points barely move (blend ~ 0 near the fixed set)
    assert np.abs(out[fixed] - pts[fixed]).max() < 2e-3


@pytest.mark.slow
def test_naca_shape_optimization_reduces_drag():
    from test_naca import naca_case

    solver, inputs, pts, topo = naca_case()
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    CD0 = float(solver.run_function("CD", state, inputs))

    ffd = FFDBox(pts, nx=6, ny=4, nz=2,
                 bounds=([-0.2, -0.25, -1.0], [1.2, 0.25, 1.1]))
    nx, ny, nz = ffd.shape
    ix = np.arange(1, nx - 1)
    iy = np.arange(1, ny - 1)
    n_dv = len(ix) * len(iy)
    pts0 = jnp.asarray(pts, solver.dtype)

    def geo_fn(dv):
        # DVs: y-displacement of xy-interior control points (same at all z)
        dcp = jnp.zeros((nx, ny, nz, 3), solver.dtype)
        vals = dv.reshape(len(ix), len(iy))
        for a, i in enumerate(ix):
            for b, j in enumerate(iy):
                dcp = dcp.at[i, j, :, 1].set(vals[a, b])
        return ffd(pts0, dcp)

    prob = ShapeOptProblem(solver, geo_fn, "CD")
    # gradient sanity vs FD on one DV
    funcs, st, inp = prob.eval_all(np.zeros(n_dv))
    g = prob.grad(np.zeros(n_dv), "CD", st, inp)
    eps = 1e-5
    e = np.zeros(n_dv); e[1] = eps
    fp, *_ = prob.eval_all(e); fm, *_ = prob.eval_all(-e)
    fd = (fp["CD"] - fm["CD"]) / (2 * eps)
    assert g[1] == pytest.approx(fd, rel=5e-3), (g[1], fd)

    res = prob.run(np.zeros(n_dv),
                   bounds=[(-0.02, 0.02)] * n_dv, maxiter=2)
    assert res.fun < CD0 - 1e-5, (res.fun, CD0)
