"""Pre/post-processing utilities (reference src/utilities roles).

probe_time_series / set_probe_data / field_rmse_time_series /
deform_dyn_mesh / set_boundary_layer_patch / calc_force_per_s, plus the
probe CLI subcommand on a real checkpoint file.
"""

import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver
from dafoam_tpu.utils import prepost


def small_channel():
    pts, topo = box_hex_mesh(8, 4, 1, (2.0, 1.0, 0.1),
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
        "primalMinResTol": 1e-10, "primalMaxIters": 400,
        "relaxationFactors": {"fields": {"p": 0.3},
                              "equations": {"U": 0.7}},
        "function": {},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    return solver, solver.make_inputs()


def test_probe_and_rmse_series():
    cc = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    hist = np.arange(12, dtype=float).reshape(4, 3)  # (T=4, nc=3)
    s = prepost.probe_time_series(hist, cc, [1.1, 0.0, 0.0])
    assert np.allclose(s, hist[:, 1])
    # findCell rejects points far outside any cell
    assert prepost.find_cell(cc, [50.0, 0.0, 0.0], mode="findCell") == -1
    # RMSE: reference formula sqrt(sum((a-b)^2)/nCells) per step
    b = hist + 2.0
    r = prepost.field_rmse_time_series(hist, b)
    assert np.allclose(r, 2.0)
    vec = np.ones((4, 3, 3))
    r3 = prepost.field_rmse_time_series(vec, np.zeros_like(vec))
    assert np.allclose(r3, np.sqrt(3.0))  # 3 components per cell


def test_set_probe_data():
    cc = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    f = np.zeros((2, 3))
    out = prepost.set_probe_data(f, cc, [0.9, 0.0, 0.0], [5.0, 1.0, 0.0])
    assert np.allclose(out[1], [5.0, 1.0, 0.0]) and np.allclose(out[0], 0.0)
    s = prepost.set_probe_data(np.zeros(2), cc, [0.0, 0.0, 0.0], [7.0])
    assert s[0] == 7.0


def test_deform_dyn_mesh_rotation():
    pts = np.array([[1.0, 0.0, 0.3], [0.0, 2.0, -0.1]])
    omega, dt = 0.5, 0.1
    series = prepost.deform_dyn_mesh(pts, [0.0, 0.0, 0.0], omega, dt, 8)
    assert series.shape == (8, 2, 3)
    # cumulative rotation: step i is a rotation by (i+1) omega dt
    th = 8 * omega * dt
    c, s = np.cos(th), np.sin(th)
    exp = np.array([c * 1.0, s * 1.0])
    assert np.allclose(series[-1, 0, :2], exp, atol=1e-12)
    assert np.allclose(series[:, :, 2], pts[None, :, 2])  # z untouched
    # radii preserved
    assert np.allclose(np.linalg.norm(series[-1, :, :2], axis=1),
                       np.linalg.norm(pts[:, :2], axis=1))


def test_set_boundary_layer_patch_and_force_per_s(tmp_path):
    solver, inputs = small_channel()
    p = next(pp for pp in solver.topo.patches if pp.name == "xmin")
    u0 = np.zeros((p.size, 3))
    out = prepost.set_boundary_layer_patch(solver, u0, "xmin",
                                           bl_height=0.4, U0=2.0)
    own = np.asarray(solver.topo.owner[p.start:p.start + p.size])
    y = np.asarray(solver.wall_dist)[own]
    L, U0 = 0.4, 2.0
    exp = np.where(y <= L, 2 * U0 / L**2 * (L * y - 0.5 * y * y), U0)
    assert np.allclose(out[:, 0], exp)
    assert np.all(out[:, 0] <= U0 + 1e-12) and np.all(out[:, 0] > 0.0)
    assert np.allclose(out[:, 1:], 0.0)

    # calcForcePerS: traction per unit area on the walls; x-integral of
    # traction*area equals the force objective
    state, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    fps = prepost.calc_force_per_s(solver, state, inputs,
                                   ["ymin", "ymax"],
                                   vtk_path=str(tmp_path / "fps.vtk"))
    ni = solver.topo.n_internal
    mags = np.asarray(solver.geometry(inputs).magsf[ni:])
    from dafoam_tpu.functions.registry import _wall_force
    ctx = solver.function_ctx(state, inputs)
    f = np.asarray(_wall_force({"patches": ["ymin", "ymax"]}, ctx))
    assert np.allclose(fps * mags[:, None], f, atol=1e-12)
    assert (tmp_path / "fps.vtk").read_text().startswith("# vtk")


def test_probe_cli_roundtrip(tmp_path):
    import jax.numpy as jnp
    from dafoam_tpu.mesh.polymesh import write_polymesh
    from dafoam_tpu.utils.checkpoint import save_checkpoint
    from dafoam_tpu.scripts.cli import main

    solver, inputs = small_channel()
    case = tmp_path / "case"
    write_polymesh(str(case), np.asarray(solver.points), solver.topo)
    T = np.linspace(0.0, 1.0, 5)[:, None] * np.ones(
        (1, solver.topo.n_cells))
    save_checkpoint(str(tmp_path / "hist.npz"), {"Tf": jnp.asarray(T)})
    out = tmp_path / "series.txt"
    rc = main(["probe", str(case), str(tmp_path / "hist.npz"), "Tf",
               "--coords", "0.1", "0.1", "0.05", "--out", str(out)])
    assert rc == 0
    vals = np.loadtxt(out)
    assert vals.shape == (5,)
    assert np.allclose(vals, T[:, 0])
