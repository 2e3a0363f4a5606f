"""On-TPU gradient accuracy: adjoint dJ/dx parity across platform/precision.

The reference locks adjoint-vs-forward agreement to ~1e-12 in f64 CI
(tests/testFuncs.py:17-55) and the north star demands dJ/dx fidelity on
TPU hardware.  This script measures it: runs the NACA0012 SA-RANS drag
adjoint (the bench case) in each requested (platform, dtype) config in a
SUBPROCESS (platform selection is process-global in JAX), and compares
dJ/d(inlet U), dJ/d(nu) and dJ/d(points) against the CPU float64 truth.

Usage:  python scripts/tpu_grad_parity.py [--nw 128 --nr 64 --iters 1500]
Emits one JSON line per config plus a summary table; exits nonzero if the
TPU f32 gradient misses 1e-3 relative (sanity floor) — the measured
numbers are recorded in PARITY.md.
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, %(root)r)
import jax
# jax is pre-imported by sitecustomize with the ambient platform (axon
# tunnel), so env vars are too late — force via config update
if %(platform)r != "default":
    jax.config.update("jax_platforms", %(platform)r)
if %(x64)s:
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from dafoam_tpu.mesh.airfoil import omesh_naca0012
from dafoam_tpu.solvers import make_solver

nw, nr, iters = %(nw)d, %(nr)d, %(iters)d
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
    "primalMinResTol": 1e-13,
    "primalMinIters": 50, "primalMaxIters": iters,
    "primalLinearSolver": {"pMaxIters": 50, "pRelTol": 0.05,
                           "uMaxIters": 20, "uRelTol": 0.1,
                           "turbMaxIters": 20, "turbRelTol": 0.1},
    "relaxationFactors": {"fields": {"p": 0.2},
                          "equations": {"U": 0.5, "nuTilda": 0.5}},
    "function": {"CD": {"type": "force", "patches": ["wing"],
                        "directionMode": "fixedDirection",
                        "direction": [1.0, 0.0, 0.0], "scale": 1.0}},
    # f32 cannot reach 1e-8 (FGMRES stalls at the dtype floor); use the
    # tightest tolerance each precision can actually hit.  UNRESTARTED
    # Krylov: restart cycles stagnate on this system (measured rel 5e-2
    # at restart 200 even in f64)
    "adjEqnOption": {"gmresRelTol": 1e-8 if %(x64)s else 3e-6,
                     "gmresAbsTol": 0.0,
                     "gmresRestart": 1200, "gmresMaxIters": 1200,
                     "pcType": "segregated", "pcInnerIters": 10},
    "normalizeStates": {"U": 1.0, "p": 0.5, "phi": 1.0,
                        "nuTilda": 3 * nu},
}
solver = make_solver(opts, topo, pts)
inputs = solver.make_inputs()
st, info = solver.run_primal(solver.init_state(), inputs)
psi, ai = solver.run_adjoint("CD", st, inputs)
tot = solver.run_totals("CD", st, inputs, psi)
dxs = np.asarray(tot["points"], np.float64)
out = {
    "platform": jax.devices()[0].platform,
    "dtype": str(solver.dtype.__name__ if hasattr(solver.dtype, "__name__")
                 else solver.dtype),
    "iters": int(info.iters), "max_res": float(info.max_res),
    "converged": bool(info.converged),
    "CD": float(solver.run_function("CD", st, inputs)),
    "dCD_dUin": np.asarray(tot["bc"]["U"]["far"], np.float64).tolist(),
    "dCD_dnu": float(np.asarray(tot["params"]["nu"])),
    "dCD_dpts_norm": float(np.linalg.norm(dxs)),
    "dCD_dpts_samples": dxs.reshape(-1)[::max(1, dxs.size // 16)].tolist(),
    "adj_rel_res": float(ai.resid / max(float(ai.resid0), 1e-300)),
}
print("RESULT " + json.dumps(out))
"""


def run_config(name, platform, nw, nr, iters, x64, timeout=7200):
    env = dict(os.environ)
    env.setdefault("JAX_CACHE_DIR", "/tmp/jaxcache")
    code = WORKER % {"root": ROOT, "nw": nw, "nr": nr, "iters": iters,
                     "x64": x64, "platform": platform}
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=timeout)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            out = json.loads(line[7:])
            out["config"] = name
            return out
    return {"config": name, "error": (r.stderr or r.stdout)[-2000:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nw", type=int, default=128)
    ap.add_argument("--nr", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--skip-tpu-f64", action="store_true")
    ns = ap.parse_args()

    configs = [
        ("cpu_f64", "cpu", True),
        ("cpu_f32", "cpu", False),
        ("tpu_f32", "default", False),
    ]
    if not ns.skip_tpu_f64:
        # NOTE: v5e has no native f64 — this config is expected to fail
        # (documented); pass --skip-tpu-f64 to skip the attempt
        configs.append(("tpu_f64", "default", True))

    results = {}
    for name, platform, x64 in configs:
        print(f"--- running {name} ...", flush=True)
        out = run_config(name, platform, ns.nw, ns.nr, ns.iters, x64)
        results[name] = out
        print(json.dumps(out), flush=True)

    ref = results.get("cpu_f64", {})
    if "dCD_dnu" not in ref:
        print("reference config failed; no comparison")
        return 1

    import numpy as np
    print("\nconfig      rel_err(dCD/dUin_x)  rel_err(dCD/dnu)  "
          "rel_err(|dCD/dpts|)")
    rc = 0
    for name, out in results.items():
        if name == "cpu_f64" or "dCD_dnu" not in out:
            continue
        eU = abs(out["dCD_dUin"][0] - ref["dCD_dUin"][0]) / \
            max(abs(ref["dCD_dUin"][0]), 1e-300)
        eN = abs(out["dCD_dnu"] - ref["dCD_dnu"]) / \
            max(abs(ref["dCD_dnu"]), 1e-300)
        eP = abs(out["dCD_dpts_norm"] - ref["dCD_dpts_norm"]) / \
            max(ref["dCD_dpts_norm"], 1e-300)
        print(f"{name:10s}  {eU:.3e}           {eN:.3e}        {eP:.3e}")
        if name == "tpu_f32" and max(eU, eN) > 1e-3:
            rc = 2
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
