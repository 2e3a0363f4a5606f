"""Native C++ polyMesh parser vs the pure-numpy fallback.

The native library (dafoam_tpu/native/ofparse.cpp) is the pyofm analog
(reference reads meshes through C++: pyDAFoam.py:1858-1890). These tests
lock: (a) the native parsers agree exactly with the Python fallback on a
real written case, (b) comment/whitespace tolerance, (c) the kill switch.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from dafoam_tpu import native
from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.mesh.polymesh import read_polymesh, write_polymesh


def test_native_builds():
    assert native.available(), "native ofparse library failed to build"


def test_payload_parsers():
    labels = native.parse_labels_ascii(b"// a comment\n5 ( 3 1 4 1 5 )")
    np.testing.assert_array_equal(labels, [3, 1, 4, 1, 5])

    pts = native.parse_points_ascii(
        b"2\n(\n(0 0.5 -1e-3)  /* inline */ (2.25 3 4)\n)")
    np.testing.assert_allclose(pts, [[0.0, 0.5, -1e-3], [2.25, 3.0, 4.0]])

    idx, flat = native.parse_faces_ascii(b"2(3(0 1 2) 4(4 5 6 7))")
    np.testing.assert_array_equal(idx, [0, 3, 7])
    np.testing.assert_array_equal(flat, [0, 1, 2, 4, 5, 6, 7])


def test_malformed_returns_none():
    assert native.parse_labels_ascii(b"not a list") is None
    assert native.parse_points_ascii(b"2 ( (0 0) )") is None


def test_roundtrip_matches_fallback(tmp_path):
    pts, topo = box_hex_mesh(4, 3, 2, (1.0, 1.0, 1.0))
    write_polymesh(str(tmp_path), np.asarray(pts), topo)

    pts_nat, topo_nat = read_polymesh(str(tmp_path))

    env = dict(os.environ, DAFOAM_TPU_NO_NATIVE="1")
    code = (
        "import numpy as np, sys, json\n"
        "from dafoam_tpu.mesh.polymesh import read_polymesh\n"
        f"pts, topo = read_polymesh({str(tmp_path)!r})\n"
        "np.save(sys.argv[1], pts)\n"
        "np.save(sys.argv[2], topo.face_verts)\n"
        "np.save(sys.argv[3], topo.owner)\n"
    )
    p1, p2, p3 = (str(tmp_path / f"{k}.npy") for k in ("p", "fv", "ow"))
    r = subprocess.run([sys.executable, "-c", code, p1, p2, p3],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    np.testing.assert_array_equal(np.asarray(pts_nat), np.load(p1))
    np.testing.assert_array_equal(np.asarray(topo_nat.face_verts),
                                  np.load(p2))
    np.testing.assert_array_equal(np.asarray(topo_nat.owner), np.load(p3))
