"""Benchmark: NACA0012 SA-RANS primal + adjoint wall-clock (north star).

Runs the flagship DASimpleFoam + SpalartAllmaras O-mesh case on the default
JAX platform (the real TPU chip under the driver) in float32, TO
CONVERGENCE (VERDICT r2 item 1 — no fixed-budget unconverged solves):

  - primal: BENCH_ITERS-iteration fused SIMPLE chunks until the CD drift
    per chunk is < BENCH_STD_TOL twice in a row (calcFuncStd analog)
  - adjoint: solver-level fixed-point GMRES cycles (runFPAdj analog),
    host-restarted until global relative residual < BENCH_FP_TOL

and reports cell-iterations/second over the timed convergence runs
(compiles excluded via one discarded warm-up call per program). The
numerator credits primal AND adjoint iterations 1:1: one "iteration" is
one outer sweep of the coupled stencil — a SIMPLE step in the primal, or
one step-map transpose product (the same stencil work, via vjp) in the
fixed-point adjoint GMRES. The denominator is the summed wall-clock of
both converged phases. Raw per-phase seconds/iterations are reported
alongside so wall-clock-to-solution is always visible.

Baseline: the reference publishes no numbers (SURVEY.md §6, BASELINE.json
published: {}); vs_baseline is against a CONSTRUCTED bar, documented
here: 5e4 cell-iterations/s/rank x 64 MPI ranks = 3.2e6 for an
OpenFOAM-class SIMPLE solver (the north-star target hardware pairing,
BASELINE.json: "v5e-8 faster than 64-rank MPI DAFoam"). Caveat recorded
in BENCH json: iteration-throughput alone flatters solvers that need
more iterations; the reference's GAMG-driven primal typically converges
in fewer outers than this Jacobi-CG one.

Env knobs: BENCH_NW/BENCH_NR (mesh), BENCH_ITERS, BENCH_CASE=naca|cavity.
"""

import json
import os
import subprocess
import sys
import time

REF_CELL_ITERS_PER_SEC = 3.2e6

# Primal-state checkpoint (worker-internal): lets a RETRY attempt (see
# main()) resume at the adjoint phase instead of redoing the converged
# primal. Tagged with BENCH_RUN_ID so state never leaks across driver
# invocations — every top-level `python bench.py` measures fresh.
_CKPT = os.environ.get("BENCH_CKPT", "/tmp/bench_primal_ckpt.npz")


def _ckpt_key(nw, nr, iters):
    return (f"{nw}x{nr}-{iters}-{os.environ.get('BENCH_PRELAX', '0.2')}-"
            f"{os.environ.get('BENCH_URELAX', '0.5')}-"
            f"{os.environ.get('BENCH_TRELAX', '0.5')}-"
            f"{os.environ.get('BENCH_RUN_ID', 'none')}")


def _ckpt_load(key):
    import numpy as np
    if os.environ.get("BENCH_RESUME", "1") == "0" or not os.path.exists(_CKPT):
        return None
    try:
        d = np.load(_CKPT, allow_pickle=False)
        if str(d["key"]) != key:
            return None
        meta = {k: float(d[k]) for k in
                ("t_primal", "n_primal", "cd", "max_res")}
        st = {k[3:]: d[k] for k in d.files if k.startswith("st_")}
        return st, meta
    except Exception:
        return None


def _ckpt_save(key, st, meta):
    import numpy as np
    try:
        np.savez(_CKPT, key=key,
                 **{f"st_{k}": np.asarray(v) for k, v in st.items()},
                 **meta)
    except Exception as e:
        print(f"[bench] checkpoint save failed (non-fatal): {e}",
              file=sys.stderr)


def run_naca(nw, nr, iters):
    import jax
    import jax.numpy as jnp  # noqa: F401 (health checks)

    from dafoam_tpu.mesh.airfoil import omesh_naca0012
    from dafoam_tpu.solvers import make_solver

    nu = 1e-3
    uinf = [1.0, 0.0, 0.0]
    pts, topo = omesh_naca0012(n_wrap=nw, n_radial=nr, radius=15.0,
                               first_cell=4e-3)
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "SpalartAllmaras",
        "transportProperties": {"nu": nu},
        "boundaryConditions": {
            "U": {"far": {"type": "inletOutlet", "value": uinf},
                  "wing": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {"far": {"type": "fixedValue", "value": 0.0},
                  "wing": {"type": "zeroGradient"}},
            "nuTilda": {"far": {"type": "inletOutlet", "value": 3 * nu},
                        "wing": {"type": "fixedValue", "value": 0.0}},
        },
        "initialFields": {"U": uinf, "p": 0.0, "nuTilda": 3 * nu},
        # run TO CONVERGENCE (the adjoint linearizes R(W*)=0; also the
        # honest workload). In f32 the residual-norm has a MEASUREMENT
        # floor from cancellation in b-Ax (~1e-3 at 512x512: CPU-f64
        # converges to 2e-7 with the SAME inner caps where TPU-f32 creeps
        # at 2.6e-4 while CD agrees to 5e-6 — scripts/
        # tpu_primal_floor_probe.py), so convergence is judged on the
        # OBJECTIVE like the reference's calcFuncStd: the bench runs
        # fixed `chunk`-iteration device calls and exits when the
        # relative CD drift per chunk falls below BENCH_STD_TOL twice in
        # a row. Chunking from the host (instead of primalFuncStdTol's
        # in-loop window) also sidesteps an axon-tunnel fault observed on
        # very long tracked device calls, and gives progress markers.
        "primalMinResTol": 0.0,
        "primalMinIters": iters, "primalMaxIters": iters,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1,
                               "pPC": os.environ.get("BENCH_PPC", "jacobi")},
        # Primal relaxation trade-off, measured on-chip at 512x512 (the
        # outer count is RELAXATION-limited, not pressure-solve-limited:
        # a multigrid pressure PC left it at 7,800 outers / 136 s vs
        # Jacobi-CG's 7,500 / 106 s): p=0.3/U=0.7 converges the PRIMAL
        # 2x faster (3,900 outers / 55.7 s) but its fixed-point ADJOINT
        # cannot reach the 1e-6 bar — round 4 (line smoother) plateaued
        # at rel ~5e-3; round 5 (mg smoother + live-Jacobi step map)
        # converges fast to ~1.5e-5 and then HARD-FLOORS there (flat
        # 5,000+ iters: the U=0.7 map amplifies f32 vjp noise at its
        # res-7e-4 exit state). The conservative factors win on TOTAL
        # time because only they let the adjoint finish.
        "relaxationFactors": {
            "fields": {"p": float(os.environ.get("BENCH_PRELAX", "0.2"))},
            "equations": {
                "U": float(os.environ.get("BENCH_URELAX", "0.5")),
                "nuTilda": float(os.environ.get("BENCH_TRELAX", "0.5"))}},
        "function": {"CD": {"type": "force", "patches": ["wing"],
                            "directionMode": "fixedDirection",
                            "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
        # adjoint: solver-level fixed-point mode (runFPAdj analog) — GMRES
        # on (I - dG^T) with the SIMPLE step map G, TIMED TO CONVERGENCE
        # (VERDICT r2 item 1: no more fixed-budget unconverged solves).
        # The Krylov+block-PC route stalls on this O-mesh (see
        # scripts/fp_adjoint_study.py / adjoint_spectrum_study.py).
        "adjEqnSolMethod": "fixedPoint",
        # one device call = BENCH_FP_CHUNK GMRES iterations in cycles of
        # BENCH_FP_RESTART; the host loops device calls warm-started from
        # the previous psibar AND the previous recycle space (aug0/
        # return_aug — deflation survives host restarts) until the GLOBAL
        # relative residual meets BENCH_FP_TOL. The chunk is kept SHORT
        # (2 restart cycles, ~8s on-chip): the axon tunnel faults very
        # long single device calls — BENCH_r04's 'TPU device error' hit
        # exactly on the 600-iteration adjoint warm-up call, the same
        # fault class that forced the primal's 300-iter chunking.
        # In-call tolerance: fpRelTol is set to the global target times a
        # safety margin so a call that crosses the finish line exits
        # instead of burning its budget.
        "adjEqnOption": {
            "fpRelTol": float(os.environ.get("BENCH_FP_TOL", "1e-6")) * 0.3,
            "fpMaxIters": int(os.environ.get("BENCH_FP_CHUNK", "240")),
            "fpInnerScale": float(os.environ.get("BENCH_FP_SCALE", "0.4")),
            # mg smoother: geometric-multigrid V-cycle defect correction
            # inside the step map (linalg/mg.py) — grid-independent
            # contraction. Measured on-chip at 512x512 (round 5, with
            # the live-Jacobi momentum scans): mg converges the adjoint
            # in 7,200 iters / 184 s where the ADI "line" smoother needs
            # 14,400 / 387 s (and with the frozen momentum scans of the
            # round-4 tail commits, line stalled outright at rel 1.4e-2
            # — scripts/adjoint_exp_r5.py A/B studies). Jacobi/Chebyshev
            # smoothers stall near rel 1e-2 at this scale.
            "fpInnerSmoother": os.environ.get("BENCH_FP_SMOOTHER", "mg"),
            # step-map FIELD-relaxation override (exact: alpha_p is an
            # explicit blend outside every residual, so the primal's W*
            # stays a fixed point for any alpha_p and totals are
            # invariant — solvers/base._fp_step_fn; equation relaxation
            # must NOT be overridden and base.py raises on it). On-chip
            # 512x512: the primal's alpha_p=0.2 map decelerates to a
            # 0.76x/600 crawl at rel 1e-3 (14k-iter budget misses 1e-6);
            # alpha_p=0.7 converges through 1e-6 in ~15-18k iters.
            "fpRelaxFields": {"p": float(os.environ.get("BENCH_FP_RELAXP",
                                                        "0.7"))},
            "fpAcceleration": "gmres",
            "gmresRestart": int(os.environ.get("BENCH_FP_RESTART", "120")),
            # deflated restarts (GMRES-E recycling, linalg/krylov.gmres):
            # restarted GMRES on (I - dG^T) stalls when a few eigenvalues
            # of dG sit near 1 (BENCH_r03: plateau at rel 1.8e-2); the
            # recycle space keeps those directions deflated across both
            # in-device restarts and host-level warm restarts
            "gmresDeflate": int(os.environ.get("BENCH_DEFLATE", "16")),
            "gmresAbsTol": 1e-30,
            "pcType": "none"},
        "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                            "nuTilda": 3 * nu},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    st0 = solver.init_state()

    def _mark(msg, _t0=[time.perf_counter()]):
        # progress to stderr so a slow TPU-tunnel compile is visible
        print(f"[bench +{time.perf_counter() - _t0[0]:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    # compile + run primal: `iters`-iteration device chunks until the CD
    # drift per chunk is below std_tol twice in a row (calcFuncStd analog
    # driven from the host; see option-block comment above)
    std_tol = float(os.environ.get("BENCH_STD_TOL", "1e-5"))
    # 512x512 takes ~7500 SIMPLE iters to CD-drift<1e-5 (geometric decay
    # x0.66 per 300-iter chunk measured on-chip); leave headroom
    max_iters = int(os.environ.get("BENCH_MAX_ITERS", "12000"))
    _mark(f"compiling primal ({topo.n_cells} cells, {iters}-iter chunks)")

    def primal_to_convergence():
        st, n, cd_prev, calm = st0, 0, None, 0
        t_sum, drift = 0.0, float("inf")
        while n < max_iters:
            t0 = time.perf_counter()
            st, info = solver.run_primal(st if n else st0, inputs)
            jax.block_until_ready(st["p"])
            t_sum += time.perf_counter() - t0
            n += int(info.iters)
            if bool(info.failed) or int(info.iters) < iters:
                raise RuntimeError(
                    f"primal chunk failed at {n} iters: "
                    f"max_res={float(info.max_res):.3e}")
            cd_now = float(solver.run_function("CD", st, inputs))
            drift = (abs(cd_now - cd_prev) / max(abs(cd_now), 1e-30)
                     if cd_prev is not None else float("inf"))
            _mark(f"  chunk @{n}: CD={cd_now:.6f} drift={drift:.2e} "
                  f"res={float(info.max_res):.2e}")
            cd_prev = cd_now
            calm = calm + 1 if drift < std_tol else 0
            if calm >= 2:
                return st, info, cd_now, n, t_sum
        raise RuntimeError(
            f"primal unconverged: CD drift {drift:.3e} > {std_tol:g} "
            f"after {n} iters")

    # warm the compile with ONE chunk (discarded), then time a single
    # convergence pass from st0 — every timed call is a steady-state
    # device call, and the bench runs the workload approximately once
    # (one discarded warm-up chunk per program; a full untimed
    # convergence pass before a full timed one doubled wall-clock for no
    # extra information and risked the driver's bench timeout)
    ck = _ckpt_key(nw, nr, iters)
    resumed = _ckpt_load(ck)
    if resumed is not None:
        st_h, meta = resumed
        st = {k: jnp.asarray(v) for k, v in st_h.items()}
        cd, n_primal = meta["cd"], int(meta["n_primal"])
        t_primal, primal_res = meta["t_primal"], meta["max_res"]
        _mark(f"primal resumed from checkpoint ({n_primal} iters, "
              f"{t_primal:.2f}s, CD={cd:.6f}) — retry attempt goes "
              f"straight to the adjoint")
    else:
        _st, _info = solver.run_primal(st0, inputs)
        jax.block_until_ready(_st["p"])
        float(solver.run_function("CD", _st, inputs))  # warm the CD program
        _mark("primal compiled; timed convergence run")
        st, info, cd, n_primal, t_primal = primal_to_convergence()
        primal_res = float(info.max_res)
        if not bool(jnp.isfinite(jnp.asarray(cd))):
            raise RuntimeError("non-finite objective after primal")
        _ckpt_save(ck, {k: v for k, v in st.items()},
                   {"t_primal": t_primal, "n_primal": float(n_primal),
                    "cd": float(cd), "max_res": primal_res})

    # compile + run adjoint TO CONVERGENCE: fixed-length fixed-point
    # GMRES cycles on the step map, host-restarted from the previous
    # psibar until ||r|| / ||r0_global|| < BENCH_FP_TOL
    fp_tol = float(os.environ.get("BENCH_FP_TOL", "1e-6"))
    # 512x512 with deflate=16 + mg smoother + alpha_p 0.7 step map
    # passes rel 1e-6 in ~7,200 iters on-chip (25-27 ms/iter incl. host
    # restarts — round-5 live-Jacobi step map); leave headroom
    fp_max = int(os.environ.get("BENCH_FP_ITERS", "16000"))
    _mark(f"primal timed: {t_primal:.2f}s; compiling adjoint")
    inputs_c = jax.tree_util.tree_map(jnp.asarray, inputs)
    # recycle space threads through host restarts (aug0 in / U out), so
    # deflation keeps working across the short chunked device calls
    n_defl = max(int(os.environ.get("BENCH_DEFLATE", "16")), 1)
    adj_cycle = jax.jit(
        lambda s, p0, u0: solver.solve_adjoint(s, inputs_c, "CD", psi0=p0,
                                               aug0=u0, return_aug=True))

    def _aug0(dtype):
        n_flat = sum(int(jnp.size(v)) for v in st.values())
        return jnp.zeros((n_defl, n_flat), dtype)

    def adjoint_to_convergence():
        psi = jax.tree_util.tree_map(jnp.zeros_like, st)
        aug = _aug0(st["p"].dtype)
        t_sum, n, r0g, rel = 0.0, 0, None, float("inf")
        while n < fp_max:
            t0 = time.perf_counter()
            psi, ai, aug = adj_cycle(st, psi, aug)
            jax.block_until_ready(psi["p"])
            t_sum += time.perf_counter() - t0
            n += int(ai.iters)
            r0g = float(ai.resid0) if r0g is None else r0g
            rel = float(ai.resid) / r0g
            _mark(f"  adj cycle @{n}: rel={rel:.2e}")
            if rel < fp_tol:
                return psi, n, rel, t_sum
        raise RuntimeError(
            f"adjoint did not converge: {n} iters, rel resid {rel:.3e}")

    # same warm-then-time structure as the primal: one discarded cycle
    # pays the compile, then a single timed convergence run from zeros
    _psi0 = jax.tree_util.tree_map(jnp.zeros_like, st)
    jax.block_until_ready(adj_cycle(st, _psi0, _aug0(st["p"].dtype))[0]["p"])
    _mark("adjoint compiled; timed convergence run")
    psi, n_adj, adj_rel, t_adj = adjoint_to_convergence()
    if not all(bool(jnp.all(jnp.isfinite(v))) for v in psi.values()):
        raise RuntimeError("non-finite adjoint solution")

    # Headline = PRIMAL-phase throughput (ADVICE r4: crediting adjoint
    # fp-GMRES iterations 1:1 with SIMPLE iterations inflates a combined
    # number, since one step-map transpose costs ~2-3x a forward step;
    # the constructed bar is per-SIMPLE-iteration, so compare
    # like-for-like). The adjoint must still CONVERGE for the bench to
    # report at all; its wall-clock and iteration count are alongside.
    cell_iters = topo.n_cells * n_primal / t_primal
    combined = topo.n_cells * (n_primal + n_adj) / (t_primal + t_adj)
    return {
        "metric": f"NACA0012 SA-RANS {nw}x{nr} primal SIMPLE throughput "
                  f"({n_primal} iters, CONVERGED by CD-drift<{std_tol:g}, "
                  f"res {primal_res:.1e}; adjoint fixedPoint GMRES "
                  f"CONVERGED to relTol {fp_tol:g} in {n_adj} iters, "
                  f"{t_adj:.0f}s) [{jax.devices()[0].platform}]",
        "value": round(cell_iters, 1),
        "unit": "cell-iterations/s",
        "vs_baseline": round(cell_iters / REF_CELL_ITERS_PER_SEC, 4),
        "primal_s": round(t_primal, 3),
        "primal_iters": n_primal,
        "primal_res": primal_res,
        "adjoint_s": round(t_adj, 3),
        "total_s": round(t_primal + t_adj, 3),
        "CD": round(float(cd), 6),
        "adj_iters": n_adj,
        "adj_res": adj_rel,
        "combined_cell_iters_per_s": round(combined, 1),
        "primal_resumed": resumed is not None,
        "baseline_note": "vs_baseline bar is CONSTRUCTED (reference "
                         "publishes no numbers): 5e4 cell-iters/s/rank x "
                         "64 ranks; headline is the primal phase only "
                         "(like-for-like per-SIMPLE-iteration); see "
                         "total_s for wall-clock-to-solution incl. the "
                         "converged adjoint",
    }


def run_cavity(n, iters):
    import jax

    from dafoam_tpu.mesh import box_hex_mesh
    from dafoam_tpu.solvers import make_solver

    pts, topo = box_hex_mesh(n, n, 1, (0.1, 0.1, 0.01),
                             kinds={"zmin": "empty", "zmax": "empty",
                                    "xmin": "wall", "xmax": "wall",
                                    "ymin": "wall", "ymax": "wall"})
    opts = {
        "solverName": "DASimpleFoam",
        "turbulenceModel": "None",
        "transportProperties": {"nu": 0.001},
        "boundaryConditions": {
            "U": {"ymax": {"type": "fixedValue", "value": [1.0, 0.0, 0.0]},
                  "ymin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "xmin": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]},
                  "xmax": {"type": "fixedValue", "value": [0.0, 0.0, 0.0]}},
            "p": {k: {"type": "zeroGradient"}
                  for k in ("xmin", "xmax", "ymin", "ymax")},
        },
        "initialFields": {"U": [0.0, 0.0, 0.0], "p": 0.0},
        "primalMinResTol": 0.0,
        "primalMinIters": iters, "primalMaxIters": iters,
        "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                               "uMaxIters": 20, "uRelTol": 0.1,
                               "turbMaxIters": 20, "turbRelTol": 0.1},
    }
    solver = make_solver(opts, topo, pts)
    inputs = solver.make_inputs()
    st0 = solver.init_state()
    st, info = solver.run_primal(st0, inputs)
    jax.block_until_ready(st["p"])
    t0 = time.perf_counter()
    st, info = solver.run_primal(st0, inputs)
    jax.block_until_ready(st["p"])
    dt = time.perf_counter() - t0
    cell_iters = topo.n_cells * iters / dt
    return {
        "metric": f"SIMPLE cavity {n}x{n} primal throughput ({iters} fused "
                  f"SIMPLE iters, {jax.devices()[0].platform})",
        "value": round(cell_iters, 1),
        "unit": "cell-iterations/s",
        "vs_baseline": round(cell_iters / REF_CELL_ITERS_PER_SEC, 4),
    }


def _device_probe_ok(timeout=240):
    """Probe the default JAX platform in a SUBPROCESS: the axon TPU tunnel
    can wedge (hangs forever in-process, unkillable once the backend is
    touched). Probing in a child keeps the parent's backend untouched."""
    code = ("import jax, jax.numpy as jnp;"
            "jax.block_until_ready(jnp.ones((128,128)).sum());"
            "print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def _worker_main():
    import jax
    case = os.environ.get("BENCH_CASE", "naca")
    try:
        if os.environ.get("BENCH_ON_CPU") == "1":
            jax.config.update("jax_platforms", "cpu")
        elif (os.environ.get("BENCH_SKIP_PROBE") != "1"
              and not _device_probe_ok()):
            # Dead/wedged device: FAIL the attempt so the parent retries
            # after a cooldown (the tunnel often recovers) — silently
            # falling back to CPU at the 512x512 default would churn past
            # any timeout.
            raise RuntimeError("device probe failed (wedged/unavailable "
                               "accelerator tunnel)")
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
        iters = int(os.environ.get("BENCH_ITERS", "300"))
        if case == "naca":
            # 512x512 = 262,144 cells: large enough to occupy a TPU chip
            # (VERDICT r1: the 128x48 default was latency-bound)
            out = run_naca(int(os.environ.get("BENCH_NW", "512")),
                           int(os.environ.get("BENCH_NR", "512")), iters)
        else:
            out = run_cavity(int(os.environ.get("BENCH_N", "96")), iters)
    except Exception as e:
        if os.environ.get("BENCH_RAISE") == "1":
            raise
        out = {"metric": f"bench failed ({case})", "value": 0.0,
               "unit": "cell-iterations/s", "vs_baseline": 0.0,
               "error": f"{type(e).__name__}: {e}"}
    print(json.dumps(out))


def _parse_last_json(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except Exception:
                pass
    return None


def main():
    """Supervisor: run the workload in a SUBPROCESS and retry on failure.

    BENCH_r04 failed on a transient 'UNAVAILABLE: TPU device error'
    during the adjoint compile, and the axon tunnel can also wedge
    outright (futex hang, no error). Subprocess isolation gives (a) a
    hard per-attempt timeout on wedges, (b) a fresh backend per retry,
    (c) cheap retries — the persistent compile cache plus the
    primal-state checkpoint (BENCH_RUN_ID-tagged) mean a retry resumes
    at the phase that failed. If the device stays dead for all attempts,
    a final attempt runs on CPU at a reduced mesh (honestly labeled via
    the metric's [cpu] platform tag) so a dead tunnel yields a real,
    smaller measurement instead of value 0.
    """
    if os.environ.get("BENCH_WORKER") == "1":
        return _worker_main()
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "3"))
    timeout_s = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "3300"))
    cooldown = float(os.environ.get("BENCH_RETRY_COOLDOWN", "120"))
    budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "7200"))
    cpu_fallback = os.environ.get("BENCH_CPU_FALLBACK", "1") == "1"
    t_start = time.monotonic()
    run_id = f"{os.getpid()}-{int(time.time())}"
    last = None

    def attempt(extra_env, tmo):
        env = dict(os.environ)
        env["BENCH_WORKER"] = "1"
        env["BENCH_RUN_ID"] = run_id
        env.update(extra_env)
        try:
            # stderr INHERITED: the worker's progress markers stream live
            # (a silent 15-minute bench looks wedged from outside)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, text=True, timeout=tmo,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            out = _parse_last_json(r.stdout)
            if out is None:
                out = {"error": f"worker emitted no JSON (rc={r.returncode},"
                                f" see stderr above)"}
            return out
        except subprocess.TimeoutExpired:
            return {"error": f"attempt exceeded {tmo:.0f}s wall-clock "
                             f"(wedged accelerator tunnel?)"}

    for k in range(attempts):
        remaining = budget - (time.monotonic() - t_start)
        if remaining < 300:
            break
        print(f"[bench] attempt {k + 1}/{attempts} "
              f"(budget left {remaining:.0f}s)", file=sys.stderr, flush=True)
        out = attempt({}, min(timeout_s, remaining))
        if out.get("value", 0) > 0:
            print(json.dumps(out))
            return
        last = out
        print(f"[bench] attempt {k + 1} failed: "
              f"{out.get('error', 'unknown')}", file=sys.stderr, flush=True)
        if k + 1 < attempts:
            time.sleep(cooldown)

    remaining = budget - (time.monotonic() - t_start)
    if cpu_fallback and remaining > 600:
        nw = os.environ.get("BENCH_CPU_NW", "128")
        nr = os.environ.get("BENCH_CPU_NR", "128")
        print(f"[bench] device attempts exhausted; CPU fallback at "
              f"{nw}x{nr}", file=sys.stderr, flush=True)
        out = attempt({"BENCH_ON_CPU": "1", "BENCH_NW": nw, "BENCH_NR": nr,
                       "BENCH_MAX_ITERS": "40000",
                       "BENCH_FP_ITERS": "40000"}, remaining - 60)
        if out.get("value", 0) > 0:
            out["baseline_note"] = (out.get("baseline_note", "") +
                                    " [CPU FALLBACK: accelerator was "
                                    "unavailable for every attempt]")
            print(json.dumps(out))
            return
        last = out

    err = (last or {}).get("error", "no attempt completed")
    print(json.dumps({"metric": "bench failed "
                                f"({os.environ.get('BENCH_CASE', 'naca')})",
                      "value": 0.0, "unit": "cell-iterations/s",
                      "vs_baseline": 0.0, "error": err}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
