"""SPMD parity: the sharded primal/adjoint must reproduce single-device
results on an 8-virtual-device mesh (SURVEY.md §7 step 6: "prove 1-chip ==
8-chip parity" — something the MPI reference can only test with real
ranks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.mesh.topology import apply_cell_permutation
from dafoam_tpu.parallel.partition import (partition_cells,
                                           reorder_for_partitions,
                                           cut_statistics)
from dafoam_tpu.parallel.shard import device_mesh, shard_case
from dafoam_tpu.solvers import make_solver


def cavity_case(topo, pts):
    zero = [0.0, 0.0, 0.0]
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.01},
        "boundaryConditions": {
            "U": {"ymax": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "ymin": {"type": "fixedValue", "value": zero},
                  "xmin": {"type": "fixedValue", "value": zero},
                  "xmax": {"type": "fixedValue", "value": zero}},
            "p": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": zero, "p": 0.0},
        "primalMinResTol": 1e-10, "primalMaxIters": 400,
        "relaxationFactors": {"fields": {"p": 0.3}, "equations": {"U": 0.7}},
        "function": {"lidF": {"type": "force", "patches": ["ymax"],
                              "directionMode": "fixedDirection",
                              "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0},
    }
    return make_solver(opts, topo, pts)


def test_partitioner_quality():
    pts, topo = box_hex_mesh(16, 16, 1, (0.1, 0.1, 0.01))
    from dafoam_tpu.mesh.geometry import compute_geometry
    geom = compute_geometry(jnp.asarray(pts), topo)
    part = partition_cells(np.asarray(geom.cc), 8)
    # equal sizes
    sizes = np.bincount(part, minlength=8)
    assert sizes.max() - sizes.min() <= 1
    stats = cut_statistics(topo, part)
    assert stats["cut_fraction"] < 0.25  # RCB keeps cuts small


def test_sharded_primal_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    pts, topo = box_hex_mesh(16, 16, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    topo2, perm = reorder_for_partitions(topo, pts, 8)
    solver = cavity_case(topo2, pts)
    inputs = solver.make_inputs()
    st0 = solver.init_state()

    # single-device reference
    st_ref, info_ref = solver.run_primal(st0, inputs)
    J_ref = float(solver.run_function("lidF", st_ref, inputs))
    assert bool(info_ref.converged)

    # sharded over the 8-device mesh
    mesh = device_mesh(8)
    st_s, inputs_s = shard_case(mesh, st0, inputs)
    st_out, info_s = solver.run_primal(st_s, inputs_s)
    J_s = float(solver.run_function("lidF", st_out, inputs_s))

    assert bool(info_s.converged)
    np.testing.assert_allclose(np.asarray(st_out["U"]),
                               np.asarray(st_ref["U"]), atol=1e-10)
    assert J_s == pytest.approx(J_ref, abs=1e-12)

    # adjoint transposed-product parity (the GMRES workhorse)
    r_ref = solver._norm_residuals(st_ref, inputs)
    _, vjp_ref = jax.vjp(lambda w: solver._norm_residuals(w, inputs), st_ref)
    (g_ref,) = vjp_ref(r_ref)
    _, vjp_s = jax.vjp(lambda w: solver._norm_residuals(w, inputs_s), st_out)
    (g_s,) = vjp_s(solver._norm_residuals(st_out, inputs_s))
    np.testing.assert_allclose(np.asarray(g_s["U"]), np.asarray(g_ref["U"]),
                               atol=1e-8)


def test_halo_matvec_parity_and_vjp():
    """Explicit shard_map + ppermute halo path (parallel/halo.py): the
    sharded LDU matvec must match the single-device fvx.matvec bitwise-
    tolerantly, including through jax.vjp (reverse halo pattern), with
    comm proportional to the partition cut."""
    from dafoam_tpu.parallel.halo import HaloMatvec, build_halo_plan
    from dafoam_tpu.ops import fvmatrix as fvx

    assert len(jax.devices()) >= 8
    pts, topo = box_hex_mesh(16, 16, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    topo2, perm = reorder_for_partitions(topo, pts, 8)
    ni, nc = topo2.n_internal, topo2.n_cells

    plan = build_halo_plan(topo2, 8)
    stats = cut_statistics(topo2, np.arange(nc) // plan.ncl)
    assert plan.cut_faces == stats["n_cut_faces"]
    assert plan.cut_faces < 0.25 * ni          # comm ∝ cut, not domain

    rng = np.random.default_rng(7)
    diag = jnp.asarray(rng.normal(size=nc) + 5.0)
    lower = jnp.asarray(rng.normal(size=ni))
    upper = jnp.asarray(rng.normal(size=ni))
    x = jnp.asarray(rng.normal(size=nc))
    m = fvx.FvMatrix(diag, lower, upper, jnp.zeros((nc,)))

    y_ref = np.asarray(fvx.matvec(m, x, topo2))
    hm = HaloMatvec(topo2, device_mesh(8))
    y = hm(diag, lower, upper, x)
    # every shard's rows are exact — cells AND faces are genuinely sharded
    assert y.sharding.is_fully_replicated is False
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-13, atol=1e-13)

    # vjp parity (the adjoint-side halo: ppermute transposes automatically)
    ct = jnp.asarray(rng.normal(size=nc))
    _, vjp_h = jax.vjp(lambda d, l, u, xx: hm(d, l, u, xx),
                       diag, lower, upper, x)
    _, vjp_r = jax.vjp(
        lambda d, l, u, xx: fvx.matvec(fvx.FvMatrix(d, l, u,
                                                    jnp.zeros((nc,))),
                                       xx, topo2), diag, lower, upper, x)
    gh, gr = vjp_h(ct), vjp_r(ct)
    for a, b in zip(gh, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-13)


@pytest.mark.slow
def test_halo_parity_100k_cells():
    """VERDICT r2 item 3 'Done' bar: sharded-vs-single totals parity at
    >=100k cells (384x288 = 110,592) through the production halo path.

    Full convergence at this size costs tens of minutes on the CPU test
    backend, so parity is checked on a DETERMINISTIC fixed-work run
    instead: every inner solve is a fixed-iteration scan smoother
    (fvsolve.fixed_inner active at trace time), the primal runs a fixed
    50 outers, and the adjoint runs fixed Richardson fixed-point sweeps —
    both paths execute the identical operation sequence, so any
    difference is exactly the halo path's arithmetic (reduction order
    only). This is the same claim MPI-vs-serial parity makes in the
    reference, at reference-relevant scale."""
    from dafoam_tpu.linalg import fvsolve
    from dafoam_tpu.parallel import halo
    from dafoam_tpu.parallel.shard import shard_solver

    # drop executables accumulated by earlier tests BEFORE the 110k-cell
    # trace: XLA:CPU aborts on this trace in a loaded process (see
    # conftest.pytest_collection_modifyitems)
    jax.clear_caches()
    assert len(jax.devices()) >= 8
    pts, topo = box_hex_mesh(384, 288, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    topo2, _perm = reorder_for_partitions(topo, pts, 8)

    def build():
        s = cavity_case(topo2, pts)
        s.option.set("primalMinResTol", 0.0)
        s.option.set("primalMaxIters", 50)
        s.option.set("adjEqnSolMethod", "fixedPoint")
        s.option.set("adjEqnOption.fpAcceleration", "richardson")
        s.option.set("adjEqnOption.fpRelTol", 1e-30)
        s.option.set("adjEqnOption.fpMaxIters", 30)
        s.option.set("adjEqnOption.fpInnerScale", 0.5)
        return s

    def run(s):
        with fvsolve.fixed_inner(1.0):
            st, _info = s.run_primal(s.init_state(), inputs)
        J = float(s.run_function("lidF", st, inputs))
        psibar, _ai = s.solve_adjoint(st, inputs, "lidF")
        tot = s.total_derivative(st, inputs, "lidF", psibar)
        return st, J, tot

    ref = build()
    inputs = ref.make_inputs()
    st_ref, J_ref, tot_ref = run(ref)

    sol = build()
    mesh, hm = shard_solver(sol, 8)
    assert hm.plan.cut_faces > 0
    try:
        st, J, tot = run(sol)
    finally:
        halo.deactivate(sol.topo)

    np.testing.assert_allclose(np.asarray(st["U"]), np.asarray(st_ref["U"]),
                               atol=1e-11)
    assert J == pytest.approx(J_ref, abs=1e-12, rel=1e-10)
    np.testing.assert_allclose(np.asarray(tot["params"]["nu"]),
                               np.asarray(tot_ref["params"]["nu"]),
                               rtol=1e-10, atol=1e-14)
    scale = max(1.0, float(np.abs(np.asarray(tot_ref["points"])).max()))
    np.testing.assert_allclose(np.asarray(tot["points"]),
                               np.asarray(tot_ref["points"]),
                               rtol=1e-10, atol=1e-10 * scale)


def test_halo_production_primal_adjoint_parity():
    """VERDICT r2 item 3: the halo path wired into the PRODUCTION solve —
    parallel.shard.shard_solver routes every LDU matvec (primal smoother
    Krylov iterations, adjoint products) through shard_map+ppermute; full
    primal + adjoint + totals must match the single-device run to 1e-10."""
    from dafoam_tpu.parallel import halo
    from dafoam_tpu.parallel.shard import shard_solver

    assert len(jax.devices()) >= 8
    pts, topo = box_hex_mesh(16, 16, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    topo2, _perm = reorder_for_partitions(topo, pts, 8)

    # single-device reference (run to completion BEFORE activation:
    # matvec dispatch happens at trace time)
    ref = cavity_case(topo2, pts)
    inputs = ref.make_inputs()
    st_ref, info_ref = ref.run_primal(ref.init_state(), inputs)
    assert bool(info_ref.converged)
    J_ref = float(ref.run_function("lidF", st_ref, inputs))
    psi_ref, ai_ref = ref.solve_adjoint(st_ref, inputs, "lidF")
    assert bool(ai_ref.converged)
    tot_ref = ref.total_derivative(st_ref, inputs, "lidF", psi_ref)

    # sharded-faces production path
    sol = cavity_case(topo2, pts)
    mesh, hm = shard_solver(sol, 8)
    assert hm.plan.cut_faces > 0
    try:
        st, info = sol.run_primal(sol.init_state(), inputs)
        assert bool(info.converged)
        J = float(sol.run_function("lidF", st, inputs))
        psi, ai = sol.solve_adjoint(st, inputs, "lidF")
        assert bool(ai.converged)
        tot = sol.total_derivative(st, inputs, "lidF", psi)
    finally:
        halo.deactivate(sol.topo)

    assert J == pytest.approx(J_ref, abs=1e-12, rel=1e-10)
    np.testing.assert_allclose(np.asarray(st["U"]), np.asarray(st_ref["U"]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(tot["params"]["nu"]),
                               np.asarray(tot_ref["params"]["nu"]),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(tot["points"]),
                               np.asarray(tot_ref["points"]),
                               rtol=1e-8, atol=1e-12)
