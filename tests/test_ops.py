"""FV operator unit tests on hand-checkable meshes (SURVEY.md §7 step 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.mesh import box_hex_mesh, compute_geometry
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.linalg import fvsolve


def setup(nx=6, ny=5, nz=1, lengths=(1.0, 1.0, 0.1)):
    pts, topo = box_hex_mesh(nx, ny, nz, lengths,
                             kinds={"zmin": "empty", "zmax": "empty"})
    geom = compute_geometry(jnp.asarray(pts), topo)
    return pts, topo, geom


def linear_field(geom, a=(2.0, -1.0, 0.0), c=3.0):
    a = jnp.asarray(a)
    return geom.cc @ a + c, a


def test_grad_exact_for_linear_field():
    pts, topo, geom = setup()
    psi, a = linear_field(geom)
    # boundary values: exact linear field at face centres
    ni = topo.n_internal
    psi_b = geom.cf[ni:] @ a + 3.0
    g = fvc.grad(geom, topo, psi, psi_b)
    np.testing.assert_allclose(np.asarray(g[:, 0]), 2.0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g[:, 1]), -1.0, atol=1e-11)


def test_interpolate_and_sngrad_linear():
    pts, topo, geom = setup()
    psi, a = linear_field(geom)
    ni = topo.n_internal
    psi_b = geom.cf[ni:] @ a + 3.0
    f = fvc.interpolate(geom, topo, psi, psi_b)
    exact = geom.cf @ a + 3.0
    np.testing.assert_allclose(np.asarray(f), np.asarray(exact), atol=1e-11)

    sng_b = jnp.zeros((topo.n_boundary,))
    sg = fvc.snGrad(geom, topo, psi, sng_b)[:ni]
    nhat = geom.sf[:ni] / geom.magsf[:ni][:, None]
    exact_sg = nhat @ a
    np.testing.assert_allclose(np.asarray(sg), np.asarray(exact_sg), atol=1e-11)


def test_laplacian_matrix_of_linear_field_is_zero():
    """Laplacian of a linear field vanishes (interior rows, fixedValue BCs)."""
    pts, topo, geom = setup()
    psi, a = linear_field(geom)
    ni = topo.n_internal
    exact_b = geom.cf[ni:] @ a + 3.0
    spec = {p.name: {"type": "fixedValue"} for p in topo.patches
            if p.kind != "empty"}
    spec.update({p.name: {"type": "empty"} for p in topo.patches
                 if p.kind == "empty"})
    vals = {}
    for p in topo.patches:
        if p.kind != "empty":
            vals[p.name] = exact_b[topo.patch_bslice(p.name)]
    bco = bc.coeffs(spec, vals, topo, geom, psi, rank=0)
    gamma_f = jnp.ones((topo.n_faces,))
    M = fvm.laplacian(geom, topo, gamma_f, psi, bco)
    r = fvx.residual(M, psi, geom, topo)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)


def test_poisson_solve_matches_manufactured_solution():
    """-lap(psi) = f with psi = sin(pi x) sin(pi y), Dirichlet exact BCs."""
    pts, topo, geom = setup(24, 24, 1)
    ni = topo.n_internal

    def exact(xy):
        return jnp.sin(jnp.pi * xy[:, 0]) * jnp.sin(jnp.pi * xy[:, 1])

    psi_exact = exact(geom.cc)
    f = 2.0 * jnp.pi ** 2 * exact(geom.cc)  # -lap psi

    spec = {}
    vals = {}
    for p in topo.patches:
        if p.kind == "empty":
            spec[p.name] = {"type": "empty"}
        else:
            spec[p.name] = {"type": "fixedValue"}
            vals[p.name] = exact(geom.cf[topo.patch_slice(p.name)])

    psi0 = jnp.zeros((topo.n_cells,))
    bco = bc.coeffs(spec, vals, topo, geom, psi0, rank=0)
    gamma_f = jnp.ones((topo.n_faces,))
    M = fvm.laplacian(geom, topo, gamma_f, psi0, bco)
    # solve -lap psi = f  ->  -(M psi - src) = f*V
    Mneg = fvx.FvMatrix(diag=-M.diag, lower=-M.lower, upper=-M.upper,
                        source=-M.source + f * geom.vol)
    sol, info = fvsolve.solve(Mneg, psi0, topo, symmetric=True,
                              rel_tol=1e-12, max_iters=2000)
    assert bool(info.converged)
    err = np.abs(np.asarray(sol - psi_exact)).max()
    assert err < 5e-3, err  # second-order FV on 24x24


def test_upwind_divergence_transport():
    """div(phi, psi) with uniform U=(1,0,0): matrix row sums telescope."""
    pts, topo, geom = setup(8, 4, 1)
    U = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (topo.n_cells, 1))
    ni = topo.n_internal
    U_b = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (topo.n_boundary, 1))
    phi = fvc.flux(geom, topo, U, U_b)

    psi = jnp.ones((topo.n_cells,))
    spec = {p.name: {"type": "zeroGradient"} for p in topo.patches}
    spec["xmin"] = {"type": "fixedValue"}
    for p in topo.patches:
        if p.kind == "empty":
            spec[p.name] = {"type": "empty"}
    vals = {"xmin": 1.0}
    bco = bc.coeffs(spec, vals, topo, geom, psi, rank=0)
    M = fvm.div(geom, topo, phi, psi, bco, scheme="upwind")
    # constant field with consistent BC: residual = psi*div(phi) = 0
    r = fvx.residual(M, psi, geom, topo)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


def test_fvmatrix_A_H_consistency():
    """A()*psi - H() must equal the per-volume residual identically."""
    pts, topo, geom = setup(5, 5, 1)
    key = jax.random.PRNGKey(0)
    psi = jax.random.normal(key, (topo.n_cells,))
    U = jax.random.normal(key, (topo.n_cells, 3)) * 0.1
    U_b = jnp.zeros((topo.n_boundary, 3))
    phi = fvc.flux(geom, topo, U, U_b)
    spec = {p.name: {"type": "fixedValue"} if p.kind != "empty"
            else {"type": "empty"} for p in topo.patches}
    vals = {p.name: 0.3 for p in topo.patches if p.kind != "empty"}
    bco = bc.coeffs(spec, vals, topo, geom, psi, rank=0)
    gamma_f = jnp.full((topo.n_faces,), 0.7)
    M = fvm.div(geom, topo, phi, psi, bco) - \
        fvm.laplacian(geom, topo, gamma_f, psi, bco)
    lhs = fvx.A(M, geom) * psi - fvx.H(M, psi, geom, topo)
    rhs = fvx.residual(M, psi, geom, topo)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_relax_preserves_solution():
    """relax() must not change the converged solution: residual at the
    pre-relax solution stays zero when psi equals the relaxation point."""
    pts, topo, geom = setup(6, 3, 1)
    psi = jnp.linspace(0.0, 1.0, topo.n_cells)
    spec = {p.name: {"type": "zeroGradient"} if p.kind != "empty"
            else {"type": "empty"} for p in topo.patches}
    bco = bc.coeffs(spec, {}, topo, geom, psi, rank=0)
    gamma_f = jnp.ones((topo.n_faces,))
    M = fvm.laplacian(geom, topo, gamma_f, psi, bco)
    r0 = fvx.residual(M, psi, geom, topo)
    Mr = fvx.relax(M, psi, 0.5, topo)
    r1 = fvx.residual(Mr, psi, geom, topo)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-12)
