"""OpenFOAM polyMesh writer/reader round trip (reference reads via the
external pyofm, pyDAFoam.py:1858; we ship both directions)."""

import jax.numpy as jnp
import numpy as np

from dafoam_tpu.mesh import box_hex_mesh, compute_geometry
from dafoam_tpu.mesh.airfoil import omesh_naca0012
from dafoam_tpu.mesh.polymesh import read_polymesh, write_polymesh


def _roundtrip(tmp_path, pts, topo):
    write_polymesh(str(tmp_path), pts, topo)
    pts2, topo2 = read_polymesh(str(tmp_path))
    np.testing.assert_allclose(pts2, pts, rtol=1e-12)
    assert topo2.n_cells == topo.n_cells
    assert topo2.n_internal == topo.n_internal
    np.testing.assert_array_equal(topo2.owner, topo.owner)
    np.testing.assert_array_equal(topo2.neighbour, topo.neighbour)
    assert [p.name for p in topo2.patches] == [p.name for p in topo.patches]
    assert [p.kind for p in topo2.patches] == [p.kind for p in topo.patches]
    g1 = compute_geometry(jnp.asarray(pts), topo)
    g2 = compute_geometry(jnp.asarray(pts2), topo2)
    np.testing.assert_allclose(np.asarray(g2.vol), np.asarray(g1.vol),
                               rtol=1e-12)


def test_box_roundtrip(tmp_path):
    pts, topo = box_hex_mesh(5, 4, 2, kinds={"zmin": "empty"})
    _roundtrip(tmp_path / "box", pts, topo)


def test_omesh_roundtrip(tmp_path):
    pts, topo = omesh_naca0012(32, 8, 10.0, 1e-2)
    _roundtrip(tmp_path / "omesh", pts, topo)
