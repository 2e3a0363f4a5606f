"""OpenFOAM polyMesh reader (ASCII + binary).

The reference reads the mesh through external `pyofm` (pyDAFoam.py:1858-1890
_readOFGrid: points/faces/boundaries/owner/neighbour). This is a standalone
reader for the same on-disk format (constant/polyMesh/{points,faces,owner,
neighbour,boundary}) producing a MeshTopology + points array, so existing
OpenFOAM cases (e.g. the reference's reg-test fixtures) can be imported
directly. The number-heavy ASCII payloads go through the native C++
parser (`dafoam_tpu.native`, the pyofm analog); a pure-numpy fallback
covers every format and `DAFOAM_TPU_NO_NATIVE=1`.
"""

from __future__ import annotations

import gzip
import os
import re
import struct

import numpy as np

from dafoam_tpu import native as _native
from dafoam_tpu.mesh.topology import MeshTopology, Patch

_KIND_MAP = {
    "wall": "wall",
    "empty": "empty",
    "symmetry": "symmetry",
    "symmetryPlane": "symmetry",
    "patch": "patch",
    "processor": "processor",
    "cyclic": "patch",
    "wedge": "patch",
}


def _read_file(path):
    for cand in (path, path + ".gz"):
        if os.path.exists(cand):
            op = gzip.open if cand.endswith(".gz") else open
            with op(cand, "rb") as f:
                return f.read()
    raise FileNotFoundError(path)


def _strip_header(data: bytes):
    """Return (header dict-ish text, payload after header)."""
    # header is the FoamFile { ... } block; find its closing brace
    m = re.search(rb"FoamFile\s*\{.*?\}", data, re.S)
    if not m:
        raise ValueError("not an OpenFOAM file (no FoamFile header)")
    header = data[m.start():m.end()].decode("latin1")
    fmt = "binary" if "binary" in header else "ascii"
    return fmt, data[m.end():]


def _strip_comments(text: str) -> str:
    text = re.sub(r"//.*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    return text


def _read_labels(path):
    fmt, payload = _strip_header(_read_file(path))
    if fmt == "ascii":
        vals = _native.parse_labels_ascii(payload)
        if vals is not None:
            return vals
        text = _strip_comments(payload.decode("latin1"))
        m = re.search(r"(\d+)\s*\(", text)
        n = int(m.group(1))
        body = text[m.end():]
        vals = np.array(body[:body.index(")")].split(), dtype=np.int64)
        assert vals.size == n, (vals.size, n)
        return vals
    # binary: "N(" then N int32/int64 then ")"
    m = re.search(rb"(\d+)\s*\(", payload)
    n = int(m.group(1))
    raw = payload[m.end():]
    for dt in (np.dtype("<i4"), np.dtype("<i8")):
        if len(raw) >= n * dt.itemsize:
            arr = np.frombuffer(raw[: n * dt.itemsize], dtype=dt)
            if arr.size == n:
                return arr.astype(np.int64)
    raise ValueError(f"cannot parse binary labels in {path}")


def _read_points(path):
    fmt, payload = _strip_header(_read_file(path))
    if fmt == "ascii":
        pts = _native.parse_points_ascii(payload)
        if pts is not None:
            return pts
        text = _strip_comments(payload.decode("latin1"))
        m = re.search(r"(\d+)\s*\(", text)
        n = int(m.group(1))
        body = text[m.end():]
        nums = re.findall(r"[-+0-9.eE]+", body)
        pts = np.array(nums[: 3 * n], dtype=np.float64).reshape(n, 3)
        return pts
    m = re.search(rb"(\d+)\s*\(", payload)
    n = int(m.group(1))
    raw = payload[m.end():]
    arr = np.frombuffer(raw[: n * 24], dtype="<f8")
    return arr.reshape(n, 3).copy()


def _read_faces(path):
    """Faces as CSR: (index (n+1,), flat vertex labels)."""
    fmt, payload = _strip_header(_read_file(path))
    if fmt == "ascii":
        csr = _native.parse_faces_ascii(payload)
        if csr is not None:
            return csr
        text = _strip_comments(payload.decode("latin1"))
        m = re.search(r"(\d+)\s*\(", text)
        n = int(m.group(1))
        body = text[m.end():]
        counts, flats = [], []
        # entries look like: 4(0 1 2 3)
        for fm in re.finditer(r"(\d+)\s*\(([^)]*)\)", body):
            k = int(fm.group(1))
            verts = np.array(fm.group(2).split(), dtype=np.int64)
            assert verts.size == k
            counts.append(k)
            flats.append(verts)
            if len(counts) == n:
                break
        assert len(counts) == n
        idx = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=idx[1:])
        return idx, (np.concatenate(flats) if flats
                     else np.zeros(0, dtype=np.int64))
    # binary faces: compact list: index array (n+1) + flat vertex array
    m = re.search(rb"(\d+)\s*\(", payload)
    n_idx = int(m.group(1))
    raw = payload[m.end():]
    idx = np.frombuffer(raw[: n_idx * 4], dtype="<i4").astype(np.int64)
    rest = raw[n_idx * 4:]
    m2 = re.search(rb"(\d+)\s*\(", rest)
    n_flat = int(m2.group(1))
    flat = np.frombuffer(rest[m2.end(): m2.end() + n_flat * 4],
                         dtype="<i4").astype(np.int64)
    return idx, flat


def _read_boundary(path):
    fmt, payload = _strip_header(_read_file(path))
    text = _strip_comments(payload.decode("latin1"))
    patches = []
    for m in re.finditer(
            r"([A-Za-z0-9_\-.:]+)\s*\{([^{}]*)\}", text):
        name, body = m.group(1), m.group(2)
        if "nFaces" not in body:
            continue
        get = lambda k: re.search(k + r"\s+([^;]+);", body)
        ptype = get("type").group(1).strip()
        nfaces = int(get("nFaces").group(1))
        start = int(get("startFace").group(1))
        patches.append((name, ptype, start, nfaces))
    return patches


def read_polymesh(case_dir: str, region: str = ""):
    """Read an OpenFOAM case's polyMesh -> (points (np,3), MeshTopology)."""
    pm = os.path.join(case_dir, "constant", region, "polyMesh")
    points = _read_points(os.path.join(pm, "points"))
    fidx, fflat = _read_faces(os.path.join(pm, "faces"))
    owner = _read_labels(os.path.join(pm, "owner")).astype(np.int32)
    neighbour = _read_labels(os.path.join(pm, "neighbour")).astype(np.int32)
    bnd = _read_boundary(os.path.join(pm, "boundary"))

    n_internal = neighbour.shape[0]
    n_faces = owner.shape[0]
    n_cells = int(max(owner.max(), neighbour.max() if n_internal else 0)) + 1

    # CSR -> padded (n_faces, max_nv); pad slots repeat the FIRST vertex
    # (a degenerate repeat contributes zero area in the shoelace sums)
    fn64 = fidx[1:] - fidx[:-1]
    max_nv = int(fn64.max())
    cols = np.arange(max_nv, dtype=np.int64)[None, :]
    pos = np.where(cols < fn64[:, None], fidx[:-1, None] + cols,
                   fidx[:-1, None])
    fv = fflat[pos].astype(np.int32)
    fn = fn64.astype(np.int32)

    patches = []
    for name, ptype, start, nfaces in sorted(bnd, key=lambda t: t[2]):
        patches.append(Patch(name=name, start=start, size=nfaces,
                             kind=_KIND_MAP.get(ptype, "patch")))

    topo = MeshTopology(
        n_cells=n_cells,
        n_points=points.shape[0],
        face_verts=fv,
        face_nverts=fn,
        owner=owner,
        neighbour=neighbour,
        n_internal=n_internal,
        patches=tuple(patches),
    )
    topo.validate()
    return points, topo


# ---------------------------------------------------------------------------
# writer (round-trip support; also lets users export meshes to OpenFOAM)
# ---------------------------------------------------------------------------

_HEADER = """FoamFile
{{
    version     2.0;
    format      ascii;
    class       {cls};
    location    "constant/polyMesh";
    object      {obj};
}}
"""


def write_polymesh(case_dir: str, points, topo, region: str = ""):
    """Write points/faces/owner/neighbour/boundary in OpenFOAM ASCII format."""
    pm = os.path.join(case_dir, "constant", region, "polyMesh")
    os.makedirs(pm, exist_ok=True)
    pts = np.asarray(points)

    with open(os.path.join(pm, "points"), "w") as fh:
        fh.write(_HEADER.format(cls="vectorField", obj="points"))
        fh.write(f"{pts.shape[0]}\n(\n")
        for p in pts:
            fh.write("(%.17g %.17g %.17g)\n" % tuple(p))
        fh.write(")\n")

    with open(os.path.join(pm, "faces"), "w") as fh:
        fh.write(_HEADER.format(cls="faceList", obj="faces"))
        fh.write(f"{topo.n_faces}\n(\n")
        for f in range(topo.n_faces):
            k = int(topo.face_nverts[f])
            fh.write(str(k) + "(" +
                     " ".join(str(int(v)) for v in topo.face_verts[f, :k])
                     + ")\n")
        fh.write(")\n")

    for name, arr in (("owner", topo.owner),
                      ("neighbour", topo.neighbour)):
        with open(os.path.join(pm, name), "w") as fh:
            fh.write(_HEADER.format(cls="labelList", obj=name))
            fh.write(f"{arr.shape[0]}\n(\n")
            fh.write("\n".join(str(int(v)) for v in arr))
            fh.write("\n)\n")

    _KIND_OUT = {"wall": "wall", "empty": "empty", "symmetry": "symmetry",
                 "patch": "patch", "processor": "processor"}
    with open(os.path.join(pm, "boundary"), "w") as fh:
        fh.write(_HEADER.format(cls="polyBoundaryMesh", obj="boundary"))
        fh.write(f"{len(topo.patches)}\n(\n")
        for p in topo.patches:
            fh.write(f"    {p.name}\n    {{\n"
                     f"        type            {_KIND_OUT.get(p.kind, 'patch')};\n"
                     f"        nFaces          {p.size};\n"
                     f"        startFace       {p.start};\n    }}\n")
        fh.write(")\n")
    return pm
