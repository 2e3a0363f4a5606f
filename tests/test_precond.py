"""Adjoint preconditioner units: batched PCR tridiagonal solves and the
line-implicit transposed-operator inverse (adjoint/precond.py).

Reference analogue: the assembled dRdWTPC through ILU(1)+ASM
(pyDAFoam.py:526-548); here the strong local solve is exact per mesh line.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dafoam_tpu.linalg.tridiag import pcr_solve, pcr_solve_periodic


def _dense_tridiag(a, b, c, periodic=False):
    n = a.shape[0]
    A = np.zeros((n, n))
    for i in range(n):
        A[i, i] = b[i]
        if i > 0:
            A[i, i - 1] = a[i]
        if i < n - 1:
            A[i, i + 1] = c[i]
    if periodic:
        A[0, n - 1] = a[0]
        A[n - 1, 0] = c[n - 1]
    return A


@pytest.mark.parametrize("n", [1, 2, 7, 32, 61])
def test_pcr_solve(n):
    rng = np.random.default_rng(42)
    a = rng.normal(size=n)
    c = rng.normal(size=n)
    b = 3.0 + np.abs(a) + np.abs(c)
    a[0] = 0.0
    c[-1] = 0.0
    d = rng.normal(size=n)
    x = np.asarray(pcr_solve(*map(jnp.asarray, (a, b, c, d))))
    want = np.linalg.solve(_dense_tridiag(a, b, c), d)
    np.testing.assert_allclose(x, want, rtol=2e-5, atol=2e-6)


def test_pcr_solve_batched_vector_rhs():
    """(n, batch) coefficients with (n, batch, 3) RHS (momentum form)."""
    rng = np.random.default_rng(1)
    n, nb = 16, 5
    a = rng.normal(size=(n, nb))
    c = rng.normal(size=(n, nb))
    b = 3.0 + np.abs(a) + np.abs(c) + rng.random((n, nb))
    a[0] = 0.0
    c[-1] = 0.0
    d = rng.normal(size=(n, nb, 3))
    x = np.asarray(pcr_solve(*map(jnp.asarray, (a, b, c, d))))
    for j in range(nb):
        A = _dense_tridiag(a[:, j], b[:, j], c[:, j])
        for k in range(3):
            np.testing.assert_allclose(
                x[:, j, k], np.linalg.solve(A, d[:, j, k]),
                rtol=2e-5, atol=2e-6)


def test_pcr_solve_decoupled_lines():
    """Zero sub/super entries split one tridiagonal into independent
    lines (how stride-s solves on a flattened mesh decouple)."""
    rng = np.random.default_rng(2)
    n = 24
    a = rng.normal(size=n)
    c = rng.normal(size=n)
    b = 3.0 + np.abs(a) + np.abs(c)
    # break into 3 lines of 8
    for s in (0, 8, 16):
        a[s] = 0.0
        c[s + 7] = 0.0
    d = rng.normal(size=n)
    x = np.asarray(pcr_solve(*map(jnp.asarray, (a, b, c, d))))
    want = np.linalg.solve(_dense_tridiag(a, b, c), d)
    np.testing.assert_allclose(x, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n", [3, 8, 48])
def test_pcr_solve_periodic(n):
    rng = np.random.default_rng(3)
    a = rng.normal(size=(n, 2))
    c = rng.normal(size=(n, 2))
    b = 4.0 + np.abs(a) + np.abs(c)
    d = rng.normal(size=(n, 2))
    x = np.asarray(pcr_solve_periodic(*map(jnp.asarray, (a, b, c, d))))
    for j in range(2):
        A = _dense_tridiag(a[:, j], b[:, j], c[:, j], periodic=True)
        np.testing.assert_allclose(x[:, j], np.linalg.solve(A, d[:, j]),
                                   rtol=5e-5, atol=5e-6)


def test_pcr_periodic_zero_corners_matches_plain():
    rng = np.random.default_rng(4)
    n = 16
    a = rng.normal(size=n)
    c = rng.normal(size=n)
    b = 4.0 + np.abs(a) + np.abs(c)
    a[0] = 0.0
    c[-1] = 0.0
    d = rng.normal(size=n)
    args = list(map(jnp.asarray, (a, b, c, d)))
    x1 = np.asarray(pcr_solve(*args))
    x2 = np.asarray(pcr_solve_periodic(*args))
    np.testing.assert_allclose(x1, x2, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# line_solver_T on a real assembled operator
# ---------------------------------------------------------------------------

def _omesh_matrix():
    """Synthesize a convection-diffusion-like LDU operator on a small
    O-mesh (dense-DIA layout with a periodic wrap seam): random
    nonsymmetric bands on real faces, diagonally dominant rows."""
    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.mesh.topology import to_dia_dense
    from dafoam_tpu.mesh.geometry import compute_geometry
    from dafoam_tpu.ops.fvmatrix import FvMatrix
    from dafoam_tpu.ops.core import face_sum_pair

    pts, topo = omesh_naca0012(n_wrap=24, n_radial=8, radius=10.0,
                               first_cell=1e-2)
    topo = to_dia_dense(topo)
    geom = compute_geometry(jnp.asarray(pts), topo)
    nc, ni = topo.n_cells, topo.n_internal
    rng = np.random.default_rng(11)
    # zero coefficients on padded (zero-area) faces, like real assembly
    live = np.asarray(geom.magsf[:ni] > 0.0, dtype=np.float64)
    upper = jnp.asarray(rng.normal(size=ni) * live, jnp.float32)
    lower = jnp.asarray(rng.normal(size=ni) * live * 0.7, jnp.float32)
    sum_off = face_sum_pair(jnp.abs(upper), jnp.abs(lower), topo)
    diag = sum_off + 1.0 + jnp.asarray(rng.random(nc), jnp.float32)
    m = FvMatrix(diag=diag, lower=lower, upper=upper,
                 source=jnp.zeros((nc,), jnp.float32))
    return m, topo, geom


def test_line_directions_omesh():
    from dafoam_tpu.linalg.lines import line_directions

    _, topo, _ = _omesh_matrix()
    dirs = line_directions(topo)
    assert dirs is not None
    strides = sorted(d["stride"] for d in dirs)
    assert strides == [1, 24]
    ring = [d for d in dirs if d["stride"] == 1][0]
    assert ring["ring"] == 24 and ring["seam_band"] is not None


def test_line_solver_T_reduces_residual():
    """One line-ADI application must reduce ||r - (M/V)^T x|| by a large
    factor (it is exact per direction; the O-mesh couples two)."""
    from dafoam_tpu.adjoint.precond import line_solver_T, transpose
    from dafoam_tpu.ops.fvmatrix import matvec

    m, topo, geom = _omesh_matrix()
    solve = line_solver_T(m, topo, geom)
    assert solve is not None
    rng = np.random.default_rng(5)
    r = jnp.asarray(rng.standard_normal(topo.n_cells), jnp.float32)
    x = solve(r)
    mt = transpose(m)
    rem = r - matvec(mt, x / geom.vol, topo)
    rel = float(jnp.linalg.norm(rem) / jnp.linalg.norm(r))
    assert rel < 0.2, rel


def test_line_solver_T_vector_rank():
    from dafoam_tpu.adjoint.precond import line_solver_T, transpose
    from dafoam_tpu.ops.fvmatrix import matvec

    m, topo, geom = _omesh_matrix()
    md = m._replace(diag=jnp.stack([m.diag, m.diag * 1.1, m.diag * 0.9],
                                   axis=-1),
                    source=jnp.zeros((topo.n_cells, 3)))
    solve = line_solver_T(md, topo, geom)
    rng = np.random.default_rng(6)
    r = jnp.asarray(rng.standard_normal((topo.n_cells, 3)), jnp.float32)
    x = solve(r)
    mt = transpose(md)
    rem = r - matvec(mt, x / geom.vol[:, None], topo)
    rel = float(jnp.linalg.norm(rem) / jnp.linalg.norm(r))
    assert rel < 0.2, rel


def test_line_solver_exact_single_direction():
    """A matrix with ONLY the radial band (tridiagonal in the stride-nw
    direction) must be solved to round-off by one direction solve."""
    from dafoam_tpu.adjoint.precond import line_solver_T, transpose
    from dafoam_tpu.ops.fvmatrix import matvec

    m, topo, geom = _omesh_matrix()
    dd = topo.dia_dense()
    nc = topo.n_cells
    up = np.asarray(m.upper).reshape(len(dd[0]), nc).copy()
    lo = np.asarray(m.lower).reshape(len(dd[0]), nc).copy()
    for k, o in enumerate(dd[0]):
        if o != 24:          # zero every band but the radial one
            up[k] = 0.0
            lo[k] = 0.0
    m1 = m._replace(upper=jnp.asarray(up.ravel()),
                    lower=jnp.asarray(lo.ravel()))
    solve = line_solver_T(m1, topo, geom)
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    x = solve(r)
    mt = transpose(m1)
    rem = r - matvec(mt, x / geom.vol, topo)
    rel = float(jnp.linalg.norm(rem) / jnp.linalg.norm(r))
    assert rel < 5e-5, rel
