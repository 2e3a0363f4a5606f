"""Dense offset-major DIA face layout (mesh.topology.to_dia_dense): the
TPU-critical layout where every cell<->face movement is a broadcast or a
static shift. These tests lock bit-level equivalence with the canonical
owner-sorted layout on CPU — primal, functions, and adjoint totals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.mesh.topology import to_dia_dense
from dafoam_tpu.solvers import make_solver
from test_simple import cavity


def test_topology_conversion_roundtrip():
    pts, topo = box_hex_mesh(10, 10, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    dense = to_dia_dense(topo)
    assert dense is not None
    offs, valid = dense.dia_dense()
    K = len(offs)
    assert dense.n_internal == K * topo.n_cells
    assert int(valid.sum()) == topo.n_internal
    # real faces keep their owner/neighbour and vertices
    fmap = dense.face_map_old2new
    np.testing.assert_array_equal(dense.owner[fmap[:topo.n_internal]],
                                  topo.owner[:topo.n_internal])
    np.testing.assert_array_equal(
        dense.neighbour[fmap[:topo.n_internal]], topo.neighbour)
    # padded faces are degenerate: zero area via all-equal vertices
    pad = np.setdiff1d(np.arange(dense.n_internal),
                       fmap[:topo.n_internal])
    assert (dense.face_verts[pad] == dense.face_verts[pad][:, :1]).all()
    # boundary untouched (shifted starts)
    for p0, p1 in zip(topo.patches, dense.patches):
        assert p0.name == p1.name and p0.size == p1.size


def test_core_primitives_dense_vs_canonical():
    from dafoam_tpu.ops.core import (cell_to_face_nei, cell_to_face_own,
                                     face_sum_pair, face_sum_signed)

    pts, topo = box_hex_mesh(8, 6, 1, (1.0, 1.0, 0.1))
    dense = to_dia_dense(topo)
    fmap_i = dense.face_map_old2new[:topo.n_internal]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=topo.n_cells))
    # cell->face: dense values at REAL slots match canonical
    for fn in (cell_to_face_own, cell_to_face_nei):
        a = np.asarray(fn(x, topo))
        b = np.asarray(fn(x, dense))[np.asarray(fmap_i)]
        np.testing.assert_allclose(b, a, rtol=1e-15)
    # face->cell sums: zero-padded dense flux arrays reduce identically
    f = rng.normal(size=topo.n_internal)
    fd = np.zeros(dense.n_internal)
    fd[fmap_i] = f
    a = np.asarray(face_sum_signed(jnp.asarray(f), topo))
    b = np.asarray(face_sum_signed(jnp.asarray(fd), dense))
    np.testing.assert_allclose(b, a, rtol=1e-13, atol=1e-14)
    g = rng.normal(size=topo.n_internal)
    gd = np.zeros(dense.n_internal)
    gd[fmap_i] = g
    a = np.asarray(face_sum_pair(jnp.asarray(f), jnp.asarray(g), topo))
    b = np.asarray(face_sum_pair(jnp.asarray(fd), jnp.asarray(gd), dense))
    np.testing.assert_allclose(b, a, rtol=1e-13, atol=1e-14)
    # vjp consistency of the dense primitives (transpose check)
    ct = jnp.asarray(rng.normal(size=topo.n_cells))
    _, vjp = jax.vjp(lambda v: face_sum_signed(v, dense), jnp.asarray(fd))
    (gf,) = vjp(ct)
    # <ct, A f> == <A^T ct, f>
    lhs = float(ct @ face_sum_signed(jnp.asarray(fd), dense))
    rhs = float(jnp.asarray(gf) @ jnp.asarray(fd))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_cavity_dense_layout_matches_canonical():
    """Full solver equivalence: primal + function + adjoint totals."""
    solver_c, inputs_c, topo = cavity()
    st_c, info_c = solver_c.run_primal(solver_c.init_state(), inputs_c)
    J_c = float(solver_c.run_function("lidForce", st_c, inputs_c))
    psi_c, _ = solver_c.run_adjoint("lidForce", st_c, inputs_c)
    tot_c = solver_c.run_totals("lidForce", st_c, inputs_c, psi_c)

    from test_simple import cavity as _cav
    solver_d, inputs_d, _ = _cav()
    solver_d.option.set("meshFaceLayout", "diaDense")
    # rebuild through make_solver so the conversion path is exercised
    solver_d = make_solver(solver_d.option, topo, np.asarray(solver_c.points))
    assert solver_d.topo.dia_dense() is not None
    inputs_d = solver_d.make_inputs()
    st_d, info_d = solver_d.run_primal(solver_d.init_state(), inputs_d)
    assert bool(info_d.converged)
    np.testing.assert_allclose(np.asarray(st_d["U"]), np.asarray(st_c["U"]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_d["p"]), np.asarray(st_c["p"]),
                               atol=1e-10)
    J_d = float(solver_d.run_function("lidForce", st_d, inputs_d))
    assert J_d == pytest.approx(J_c, rel=1e-10)
    psi_d, ai = solver_d.run_adjoint("lidForce", st_d, inputs_d)
    tot_d = solver_d.run_totals("lidForce", st_d, inputs_d, psi_d)
    assert float(tot_d["params"]["nu"]) == pytest.approx(
        float(tot_c["params"]["nu"]), rel=1e-8)
    # rtol 1e-7: the dense layout's scatter-free reductions (shift sums,
    # patch-aware boundary folds) reorder f64 summation vs the canonical
    # scatter path; totals through a full solve+adjoint agree to ~1e-8
    np.testing.assert_allclose(np.asarray(tot_d["bc"]["U"]["ymax"]),
                               np.asarray(tot_c["bc"]["U"]["ymax"]),
                               rtol=1e-7, atol=1e-12)
