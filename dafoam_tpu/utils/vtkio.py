"""Surface VTK writer for sensitivity maps and boundary fields.

Observability parity with the reference's writeSensMapSurface /
writeAdjointFields ParaView dumps (DASolver.C:3840, :4055): write boundary
patches as legacy-VTK PolyData with per-face cell data (e.g. dJ/dXs
sensitivity maps, pressure, wall shear).
"""

from __future__ import annotations

import numpy as np


def write_surface_vtk(path, points, topo, patches, cell_data=None):
    """Write the boundary faces of `patches` as legacy VTK POLYDATA.

    cell_data: {name: (n_patch_faces,) or (n_patch_faces,3) arrays in the
    concatenated patch-face order}.
    """
    pts = np.asarray(points)
    fids = []
    for name in patches:
        sl = topo.patch_slice(name)
        fids.extend(range(sl.start, sl.stop))

    used = sorted({int(v) for f in fids
                   for v in topo.face_verts[f, :topo.face_nverts[f]]})
    remap = {p: i for i, p in enumerate(used)}

    with open(path, "w") as fh:
        fh.write("# vtk DataFile Version 3.0\n"
                 "dafoam_tpu surface output\nASCII\nDATASET POLYDATA\n")
        fh.write(f"POINTS {len(used)} double\n")
        for p in used:
            fh.write("%.10g %.10g %.10g\n" % tuple(pts[p]))
        total = sum(int(topo.face_nverts[f]) + 1 for f in fids)
        fh.write(f"POLYGONS {len(fids)} {total}\n")
        for f in fids:
            k = int(topo.face_nverts[f])
            ids = [remap[int(v)] for v in topo.face_verts[f, :k]]
            fh.write(str(k) + " " + " ".join(map(str, ids)) + "\n")
        if cell_data:
            fh.write(f"CELL_DATA {len(fids)}\n")
            for name, arr in cell_data.items():
                a = np.asarray(arr)
                if a.ndim == 1:
                    fh.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
                    for v in a:
                        fh.write("%.10g\n" % v)
                else:
                    fh.write(f"VECTORS {name} double\n")
                    for v in a:
                        fh.write("%.10g %.10g %.10g\n" % tuple(v))
    return path


def write_sens_map_surface(path, solver, totals, patches):
    """dJ/dXs sensitivity map on wall patches -> VTK (reference
    writeSensMapSurface role): nodal point gradients averaged to faces."""
    import jax.numpy as jnp

    topo = solver.topo
    g = np.asarray(totals["points"])
    fids = []
    for name in patches:
        sl = topo.patch_slice(name)
        fids.extend(range(sl.start, sl.stop))
    face_sens = np.zeros((len(fids), 3))
    for i, f in enumerate(fids):
        k = int(topo.face_nverts[f])
        face_sens[i] = g[topo.face_verts[f, :k]].mean(axis=0)
    return write_surface_vtk(path, np.asarray(solver.points), topo, patches,
                             {"dJdXs": face_sens})
