"""Time-spectral (hybrid) periodic unsteady mode — the reference DECLARES
`unsteadyAdjoint: {"mode": "hybrid", "nTimeInstances", "periodicity"}`
(/root/reference/dafoam/pyDAFoam.py:398-409) but never implements it;
dafoam_tpu does (solvers/time_spectral.py). Oracles:

1. the spectral d/dt operator is exact on resolvable harmonics;
2. the TS primal (N=5 instances) matches the time-accurate limit cycle
   of the same periodically-forced problem (backward-Euler reference
   integrated in-test to its periodic orbit);
3. adjoint totals == forward-AD totals == FD of the whole TS pipeline
   (the reference CI triangulation, testFuncs.py:17-55) for a
   multiFreqScalar BC amplitude — a DESIGN VARIABLE of the forcing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dafoam_tpu.mesh import box_hex_mesh
from dafoam_tpu.solvers import make_solver
from dafoam_tpu.solvers.time_spectral import spectral_derivative_matrix

PERIOD = 2.0
AMP = 0.6


def test_spectral_derivative_exact_on_harmonics():
    for n in (3, 5, 9):
        d = spectral_derivative_matrix(n, PERIOD)
        t = np.arange(n) * PERIOD / n
        for k in range(1, (n - 1) // 2 + 1):
            f = np.sin(2 * np.pi * k * t / PERIOD + 0.3)
            df = (2 * np.pi * k / PERIOD) * np.cos(
                2 * np.pi * k * t / PERIOD + 0.3)
            assert np.allclose(d @ f, df, rtol=1e-10, atol=1e-10), (n, k)
    with pytest.raises(ValueError):
        spectral_derivative_matrix(4, PERIOD)


def _case(n_inst=5, amp=AMP):
    pts, topo = box_hex_mesh(10, 6, 1, (1.0, 0.6, 0.1),
                             kinds={"zmin": "empty", "zmax": "empty"})
    opts = {
        "solverName": "DAScalarTransportFoam",
        "unsteadyAdjoint": {"mode": "hybrid", "nTimeInstances": n_inst,
                            "periodicity": PERIOD},
        "transportProperties": {"DT": 0.05},
        "boundaryConditions": {
            "T": {"xmin": {"type": "multiFreqScalar", "refValue": 1.0,
                           "amplitudes": [amp], "frequencies": [1.0 / PERIOD],
                           "phases": [0.0]},
                  "xmax": {"type": "zeroGradient"},
                  "ymin": {"type": "zeroGradient"},
                  "ymax": {"type": "zeroGradient"}},
        },
        "initialFields": {"T": 1.0},
        "primalMinResTol": 1e-11,
        "primalMaxIters": 500,
        # NB: the PDE is linear and the forcing sinusoidal, so the CYCLE-
        # AVERAGED field is amplitude-independent (dJ/damp == 0 exactly
        # for an "average" objective — confirmed by adjoint AND forward
        # AD agreeing on 0). The KS-max over the cycle is the
        # amplitude-sensitive objective (reference timeOpMaxMode: KS).
        "function": {"TMean": {"type": "variableVolSum", "varName": "T",
                               "scale": 1.0, "timeOp": "max",
                               "timeOpMaxMode": "KS", "coeffKS": 50.0}},
        "adjEqnOption": {"gmresRelTol": 1e-12, "gmresRestart": 200,
                         "gmresMaxIters": 400, "gmresAbsTol": 1e-30,
                         "pcType": "none"},
        "normalizeStates": {"T": 1.0},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    # frozen convecting velocity: uniform +x (params entry replaces the
    # None placeholder; kept a traced input like every transport prop)
    inputs["params"]["U"] = jnp.tile(
        jnp.asarray([0.4, 0.0, 0.0], solver.dtype), (topo.n_cells, 1))
    return solver, inputs


@pytest.mark.slow
def test_ts_primal_matches_time_accurate_limit_cycle():
    solver, inputs = _case(n_inst=5)
    st, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged), float(info.max_res)

    # time-accurate reference: backward Euler with the SAME per-time
    # assembly (the TS solver's own _assemble_at), integrated 6 periods
    # to the limit cycle, fine steps for the 1st-order scheme
    from dafoam_tpu.linalg import fvsolve
    geom = solver.geometry(inputs)
    phi = solver._phi(inputs, geom)
    n_per = 400
    dt = PERIOD / n_per
    vol = geom.vol
    T = jnp.full((solver.topo.n_cells,), 1.0, solver.dtype)

    def step(T, t):
        m = solver._assemble_at(T, inputs, geom, phi, t)
        m = m._replace(diag=m.diag + vol / dt,
                       source=m.source + vol / dt * T)
        Tn, _ = fvsolve.solve(m, T, solver.topo, symmetric=False,
                              rel_tol=1e-12, max_iters=2000)
        return Tn, None

    for _ in range(6):  # periods to wash out the transient
        ts_grid = (jnp.arange(n_per, dtype=solver.dtype) + 1.0) * dt
        T, _ = jax.lax.scan(step, T, ts_grid)
    # one more period sampling the instance phases t_n = n*T/N (+dt
    # alignment: state after step at time t corresponds to t)
    samples = {}
    t_marks = [n * PERIOD / 5 for n in range(5)]
    Tcur = T
    for k in range(n_per):
        t_k = (k + 1) * dt
        Tcur, _ = step(Tcur, jnp.asarray(t_k, solver.dtype))
        for n, tm in enumerate(t_marks):
            if abs(t_k - tm) < dt / 2 or (n == 0 and k == n_per - 1):
                samples[n] = Tcur
    for n in range(5):
        ts_f = st[f"T{n}"]
        ref = samples[n]
        err = float(jnp.max(jnp.abs(ts_f - ref)) /
                    jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30))
        # N=5 spectral vs 400-step backward Euler: agreement bounded by
        # the BE O(dt) error (~1/400) and the truncated harmonics
        assert err < 0.03, (n, err)


def test_ts_adjoint_forward_fd_triangulation():
    solver, inputs = _case(n_inst=5)
    st, info = solver.run_primal(solver.init_state(), inputs)
    assert bool(info.converged)
    J = float(solver.run_function("TMean", st, inputs))
    psi, ai = solver.solve_adjoint(st, inputs, "TMean")
    assert bool(ai.converged), (int(ai.iters), float(ai.resid))
    tot = solver.total_derivative(st, inputs, "TMean", psi)
    # dJ/d(amplitude of the periodic BC forcing) — the design variable
    # of the declared-but-unimplemented reference mode
    g_adj = float(tot["bc"]["T"]["xmin"]["amplitudes"][0])

    # forward-AD triangulation (reference testFuncs.py oracle)
    dxt = jax.tree_util.tree_map(jnp.zeros_like, inputs)
    dxt["bc"]["T"]["xmin"]["amplitudes"] = jnp.ones_like(
        inputs["bc"]["T"]["xmin"]["amplitudes"])
    dJ_fwd, finfo = solver.forward_total_derivative(st, inputs, "TMean",
                                                    dxt)
    assert bool(finfo.converged)
    assert abs(g_adj - float(dJ_fwd)) / max(abs(g_adj), 1e-30) < 1e-8

    # FD of the WHOLE pipeline (new solver per amplitude)
    h = 1e-5
    js = []
    for a in (AMP + h, AMP - h):
        s2, i2 = _case(n_inst=5, amp=a)
        st2, nfo = s2.run_primal(s2.init_state(), i2)
        assert bool(nfo.converged)
        js.append(float(s2.run_function("TMean", st2, i2)))
    g_fd = (js[0] - js[1]) / (2 * h)
    assert abs(g_adj - g_fd) / max(abs(g_fd), 1e-30) < 1e-6, (g_adj, g_fd, J)
