"""Round-4 diagnosis of the 512x512 fixed-point adjoint stall (BENCH_r03:
GMRES(120) on (I - dG^T) plateaus at rel 1.8e-2 after 1440 iters).

Measures, at a configurable mesh size, each factor VERDICT r3 item 1 names:
  (a) primal iterations/time to CD-drift convergence with pPC jacobi vs mg
      (multigrid pressure PC, linalg/mg.py);
  (b) rho(dG^T) at the exit state via power iteration, per step-map
      smoother (line vs mg) — is the step map a contraction where we
      linearize it?
  (c) FP-GMRES adjoint trajectory: restart x deflation (gmresDeflate,
      GMRES-E recycling) x smoother — which combination converges to 1e-6
      and at what cost.

Usage: [STUDY_PLATFORM=cpu] [STUDY_X64=0] python scripts/adjoint_stall_study_r4.py [nw nr]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("STUDY_PLATFORM", "cpu"))
if os.environ.get("STUDY_X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp
import numpy as np


def build(nw, nr, ppc):
    from scripts.pc_convergence_study import build as _b
    solver = _b(nw, nr, "none")
    solver.option.set("adjEqnSolMethod", "fixedPoint")
    solver.option.set("primalLinearSolver.pPC", ppc)
    # bench-parity loop control: fixed chunks, host-side CD-drift exit
    solver.option.set("primalMinResTol", 0.0)
    chunk = int(os.environ.get("STUDY_CHUNK", "300"))
    solver.option.set("primalMinIters", chunk)
    solver.option.set("primalMaxIters", chunk)
    if os.environ.get("STUDY_DENSE", "1") == "1":
        solver.option.set("meshFaceLayout", "diaDense")
        from dafoam_tpu.mesh.topology import to_dia_dense
        from dafoam_tpu.solvers import make_solver
        from dafoam_tpu.mesh.airfoil import omesh_naca0012
        pts, topo = omesh_naca0012(n_wrap=nw, n_radial=nr, radius=15.0,
                                   first_cell=4e-3)
        topo = to_dia_dense(topo)
        solver = make_solver(solver.option, topo, pts)
    return solver


def primal_to_convergence(solver, inputs, std_tol=1e-5, max_iters=20000):
    st = solver.init_state()
    n, cd_prev, calm, t_sum = 0, None, 0, 0.0
    while n < max_iters:
        t0 = time.perf_counter()
        st, info = solver.run_primal(st, inputs)
        jax.block_until_ready(st["p"])
        t_sum += time.perf_counter() - t0
        n += int(info.iters)
        cd = float(solver.run_function("CD", st, inputs))
        drift = (abs(cd - cd_prev) / max(abs(cd), 1e-30)
                 if cd_prev is not None else float("inf"))
        print(f"    @{n}: CD={cd:.6f} drift={drift:.2e} "
              f"res={float(info.max_res):.2e} ({t_sum:.0f}s)", flush=True)
        cd_prev = cd
        calm = calm + 1 if drift < std_tol else 0
        if calm >= 2:
            break
    return st, n, t_sum, float(info.max_res)


def power_iteration(solver, st, inputs, smoother, iters=30):
    """rho(dG^T) estimate at st for the given step-map smoother."""
    solver.option.set("adjEqnOption.fpInnerSmoother", smoother)
    step = solver._fp_step_fn()
    _, f_vjp = jax.vjp(lambda w: step(w, inputs)[0], st)

    @jax.jit
    def it(v):
        (g,) = f_vjp(v)
        from dafoam_tpu.linalg.krylov import tnorm, tscale
        nrm = tnorm(g)
        return tscale(1.0 / nrm, g), nrm

    rng = np.random.default_rng(0)
    v = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape), a.dtype), st)
    from dafoam_tpu.linalg.krylov import tnorm, tscale
    v = tscale(1.0 / tnorm(v), v)
    nrm = None
    for k in range(iters):
        v, nrm = it(v)
        if k % 10 == 9:
            print(f"    power it {k+1}: |dG^T v| = {float(nrm):.6f}",
                  flush=True)
    return float(nrm)


def fp_adjoint(solver, st, inputs, smoother, restart, deflate, scale,
               fp_tol=1e-6, max_cycles=20):
    solver.option.set("adjEqnOption.fpInnerSmoother", smoother)
    solver.option.set("adjEqnOption.fpInnerScale", scale)
    solver.option.set("adjEqnOption.gmresRestart", restart)
    solver.option.set("adjEqnOption.gmresDeflate", deflate)
    solver.option.set("adjEqnOption.fpRelTol", fp_tol * 0.3)
    # several cycles per device call: the deflation space lives inside
    # the call and only engages from cycle 2 on
    solver.option.set("adjEqnOption.fpMaxIters",
                      restart * (4 if deflate else 1))
    solver.option.set("adjEqnOption.gmresAbsTol", 1e-30)
    inputs_c = jax.tree_util.tree_map(jnp.asarray, inputs)
    adj_cycle = jax.jit(
        lambda s, p0: solver.solve_adjoint(s, inputs_c, "CD", psi0=p0))
    psi = jax.tree_util.tree_map(jnp.zeros_like, st)
    jax.block_until_ready(adj_cycle(st, psi)[0]["p"])  # compile
    t0 = time.perf_counter()
    n, r0g, rel = 0, None, float("inf")
    for _ in range(max_cycles):
        psi, ai = adj_cycle(st, psi)
        jax.block_until_ready(psi["p"])
        n += int(ai.iters)
        r0g = float(ai.resid0) if r0g is None else r0g
        rel = float(ai.resid) / max(r0g, 1e-300)
        print(f"    adj @{n}: rel={rel:.2e}", flush=True)
        if rel < fp_tol:
            break
    return n, rel, time.perf_counter() - t0


def main():
    nw = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    nr = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    for ppc in os.environ.get("STUDY_PPCS", "jacobi,mg").split(","):
        print(f"== primal pPC={ppc} ({nw}x{nr}) ==", flush=True)
        solver = build(nw, nr, ppc)
        inputs = solver.make_inputs()
        st, n, t, res = primal_to_convergence(solver, inputs)
        print(f"  primal: {n} iters, {t:.1f}s, exit res {res:.2e}")
        sol_mg, st_mg = solver, st

    print("== rho(dG^T) at the converged state ==", flush=True)
    inputs = sol_mg.make_inputs()
    for sm in os.environ.get("STUDY_RHO_SMOOTHERS", "line").split(","):
        if not sm:
            continue
        rho = power_iteration(sol_mg, st_mg, inputs, sm)
        print(f"  smoother={sm}: rho ~= {rho:.6f}")

    print("== FP adjoint: restart x deflate x smoother ==", flush=True)
    configs = os.environ.get(
        "STUDY_CONFIGS",
        "line:120:0,line:120:16,line:240:16,mg:120:16")
    for cfg in configs.split(","):
        sm, rst, dfl = cfg.split(":")
        rst, dfl = int(rst), int(dfl)
        scale = float(os.environ.get("STUDY_FP_SCALE", "0.4"))
        print(f"  smoother={sm} restart={rst} deflate={dfl}:", flush=True)
        t0 = time.perf_counter()
        n, rel, t = fp_adjoint(sol_mg, st_mg, inputs, sm, rst, dfl, scale)
        print(f"  -> {n} iters, rel={rel:.2e}, {t:.1f}s solve "
              f"(+{time.perf_counter() - t0 - t:.0f}s compile)", flush=True)


if __name__ == "__main__":
    main()
