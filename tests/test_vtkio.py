"""Volume/adjoint-field VTK dumps (reference writeAdjointFields /
writeSensMapField observability, DASolver.C:3962,:4055)."""

import numpy as np

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver
from dafoam_tpu.utils.vtkio import (write_adjoint_fields,
                                    write_sens_map_field,
                                    write_volume_vtk)


def small_solver():
    pts, topo = box_hex_mesh(4, 3, 1, (2.0, 1.0, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "ymin": "wall", "ymax": "wall"})
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.1},
        "boundaryConditions": {
            "U": {"xmin": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "ymax": {"type": "fixedValue", "value": zero}},
            "p": {"xmin": {"type": "zeroGradient"},
                  "xmax": {"type": "fixedValue", "value": 0.0},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"U": zero, "p": 0.0},
        "function": {},
    }
    return make_solver(opts, topo, pts)


def _parse_scalar_field(path, name, n):
    lines = open(path).read().splitlines()
    i = next(k for k, l in enumerate(lines) if l.startswith(f"SCALARS {name} "))
    return np.array([float(v) for v in lines[i + 2:i + 2 + n]])


def test_volume_vtk_roundtrip(tmp_path):
    solver = small_solver()
    topo = solver.topo
    nc = topo.n_cells
    beta = np.arange(nc, dtype=float)
    path = write_sens_map_field(str(tmp_path / "sens.vtk"), solver, beta,
                                name="dJdBeta")
    txt = open(path).read()
    assert f"CELL_TYPES {nc}" in txt and "UNSTRUCTURED_GRID" in txt
    got = _parse_scalar_field(path, "dJdBeta", nc)
    assert np.allclose(got, beta)
    # every hex cell must reference exactly 8 vertices
    lines = txt.splitlines()
    i = next(k for k, l in enumerate(lines) if l.startswith("CELLS "))
    counts = [int(lines[i + 1 + c].split()[0]) for c in range(nc)]
    assert counts == [8] * nc


def test_adjoint_fields_dump(tmp_path):
    solver = small_solver()
    nc = solver.topo.n_cells
    psi = solver.layout.zeros()
    psi = {k: np.asarray(v) for k, v in psi.items()}
    psi["p"] = np.arange(nc, dtype=float)
    psi["U"] = np.tile([1.0, 2.0, 3.0], (nc, 1))
    psi["phi"] = np.ones(solver.topo.n_faces)
    path = write_adjoint_fields(str(tmp_path / "psi.vtk"), solver, psi)
    txt = open(path).read()
    assert "VECTORS psi_U" in txt
    assert np.allclose(_parse_scalar_field(path, "psi_p", nc),
                       np.arange(nc, dtype=float))
    # psi_phi: all face values 1 -> incident mean is exactly 1 per cell
    assert np.allclose(_parse_scalar_field(path, "psi_phi", nc), 1.0)
