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


# ---------------------------------------------------------------------------
# hand-authored OpenFOAM fixture: NOT produced by write_polymesh, so the
# reader is checked against the on-disk format itself (banner comments,
# FoamFile headers with arch/note entries, inGroups, mixed quad+triangle
# faces).  Geometry: unit hex cell + square-based pyramid glued on x=1
# (apex (1.5,0.5,0.5)) — volumes 1 and 1/6 analytically.
# ---------------------------------------------------------------------------
import os

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "ofcase")


def _check_fixture_mesh(pts, topo):
    assert topo.n_cells == 2
    assert topo.n_internal == 1
    assert topo.n_faces == 10
    assert [(p.name, p.kind, p.size) for p in topo.patches] == [
        ("inlet", "patch", 1), ("walls", "wall", 4), ("cone", "wall", 4)]
    # mixed face sizes with the padding invariant (slots [k:] repeat slot 0)
    assert set(np.asarray(topo.face_nverts).tolist()) == {3, 4}
    fv, fn = np.asarray(topo.face_verts), np.asarray(topo.face_nverts)
    for f in range(topo.n_faces):
        assert (fv[f, fn[f]:] == fv[f, 0]).all()
    geom = compute_geometry(jnp.asarray(pts), topo)
    np.testing.assert_allclose(np.asarray(geom.vol), [1.0, 1.0 / 6.0],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(geom.cc)[0], [0.5, 0.5, 0.5],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(geom.cc)[1], [1.125, 0.5, 0.5],
                               atol=1e-12)
    # per-cell closure: sum of outward face-area vectors is zero
    sf = np.asarray(geom.sf)
    own = np.asarray(topo.owner)
    acc = np.zeros((2, 3))
    np.add.at(acc, own, sf)
    nei = np.asarray(topo.neighbour)
    np.add.at(acc, nei, -sf[: topo.n_internal])
    np.testing.assert_allclose(acc, 0.0, atol=1e-14)


def test_read_openfoam_ascii_fixture():
    pts, topo = read_polymesh(FIXTURE)
    _check_fixture_mesh(pts, topo)


def test_read_openfoam_binary_gz_fixture(tmp_path):
    """Same mesh re-emitted in OpenFOAM binary format (compact faceList:
    offsets + flat labels) with gzipped points, per the format spec —
    exercises the binary/gz parse paths against independently constructed
    bytes, not write_polymesh output."""
    import gzip

    pts, topo = read_polymesh(FIXTURE)
    pm = tmp_path / "bin" / "constant" / "polyMesh"
    os.makedirs(pm)

    def header(cls, obj, fmt="binary"):
        return (f"FoamFile\n{{\n    version 2.0;\n    format {fmt};\n"
                f"    class {cls};\n    object {obj};\n}}\n").encode()

    with gzip.open(pm / "points.gz", "wb") as fh:
        fh.write(header("vectorField", "points"))
        fh.write(b"9(")
        fh.write(np.asarray(pts, "<f8").tobytes())
        fh.write(b")")
    fv, fn = np.asarray(topo.face_verts), np.asarray(topo.face_nverts)
    offsets = np.concatenate([[0], np.cumsum(fn)]).astype("<i4")
    flat = np.concatenate(
        [fv[f, : fn[f]] for f in range(topo.n_faces)]).astype("<i4")
    with open(pm / "faces", "wb") as fh:
        fh.write(header("compoundFaceList", "faces"))
        fh.write(str(len(offsets)).encode() + b"(")
        fh.write(offsets.tobytes())
        fh.write(b")\n")
        fh.write(str(len(flat)).encode() + b"(")
        fh.write(flat.tobytes())
        fh.write(b")")
    for name, arr in (("owner", topo.owner), ("neighbour", topo.neighbour)):
        with open(pm / name, "wb") as fh:
            fh.write(header("labelList", name))
            fh.write(str(len(arr)).encode() + b"(")
            fh.write(np.asarray(arr, "<i4").tobytes())
            fh.write(b")")
    with open(pm / "boundary", "wb") as fh:
        fh.write(header("polyBoundaryMesh", "boundary", fmt="ascii"))
        body = "3\n(\n"
        for p in topo.patches:
            t = "wall" if p.kind == "wall" else "patch"
            body += (f"{p.name}\n{{\n type {t};\n nFaces {p.size};\n"
                     f" startFace {p.start};\n}}\n")
        fh.write((body + ")\n").encode())

    pts2, topo2 = read_polymesh(str(tmp_path / "bin"))
    np.testing.assert_allclose(pts2, pts, rtol=0, atol=0)
    _check_fixture_mesh(pts2, topo2)
