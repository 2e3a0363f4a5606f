"""Time-spectral (harmonic-balance) periodic unsteady solver.

Reference parity-plus: the reference DECLARES an `unsteadyAdjoint` mode
"hybrid" with `nTimeInstances`/`periodicity` keys
(/root/reference/dafoam/pyDAFoam.py:398-409) but never implements it —
only `timeAccurate` is exercised anywhere in its tests (SURVEY.md §5.7).
This module is a working TPU-native implementation of that declared
capability for the scalar-transport solver family: a periodic unsteady
flow is represented by N (odd) coupled time instances and solved as ONE
steady system, so the periodic adjoint needs no reverse time sweep at
all — `jax.vjp` of the stacked steady residual is the whole machinery,
reusing the residual-form Krylov adjoint unchanged.

Formulation (van der Weide et al., AIAA 2005-1227 class): for states
W_n at t_n = n*T/N, the time derivative is the spectral operator

    (dW/dt)_n = sum_m D_nm W_m,
    D_nm = (pi/T) * (-1)^(n-m) / sin(pi (n-m) / N),  D_nn = 0  (N odd)

which is EXACT for all harmonics the N instances resolve. The coupled
residual is R_n = R_spatial(W_n; t_n) + (D W)_n in the same per-cell
normalization as the time-accurate residual's ddt term
(solvers/scalar_transport.py residuals). Time-dependent boundary
conditions (the DAMisc multiFreq* family, ops/bc.py) are evaluated at
each instance's own t_n, so a periodically-forced BC drives a genuine
limit cycle.

Primal: block Gauss-Seidel over instances — each sweep solves every
instance's spatial operator implicitly with the spectral coupling as an
explicit source (the standard TS solution strategy), iterated to
`primalMinResTol` on the TRUE stacked residual. XLA compiles the whole
sweep loop; N is a static unroll.

Adjoint/totals/forward-AD: inherited from DASolverBase — the stacked
state is an ordinary state pytree, so solve_adjoint (FGMRES on
dR/dW^T), total_derivative, and forward_total_derivative all apply
verbatim. Objectives reduce instantaneous function values over the
cycle with DATimeOp semantics (`timeOp`: average default).

Select via `solverName: DAScalarTransportFoam` +
`unsteadyAdjoint: {"mode": "hybrid", "nTimeInstances": N,
"periodicity": T}` (reference option surface), or directly via
`solverName: DATimeSpectralScalarFoam`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dafoam_tpu.functions import evaluate_function
from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import PrimalInfo
from dafoam_tpu.solvers.scalar_transport import DAScalarTransportFoam
from dafoam_tpu.states import StateInfo
from dafoam_tpu.timeops import time_op


def spectral_derivative_matrix(n: int, period: float) -> np.ndarray:
    """The odd-N time-spectral d/dt operator (exact on resolvable
    harmonics): D_jk = (pi/T) (-1)^(j-k) / sin(pi (j-k)/N), D_jj = 0."""
    if n < 3 or n % 2 == 0:
        raise ValueError(
            f"nTimeInstances must be odd and >= 3, got {n} "
            "(even-N time-spectral operators are rank-deficient on the "
            "Nyquist mode)")
    j = np.arange(n)
    diff = j[:, None] - j[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        d = (np.pi / float(period)) * ((-1.0) ** diff) \
            / np.sin(np.pi * diff / n)
    np.fill_diagonal(d, 0.0)
    return d


class DATimeSpectralScalarFoam(DAScalarTransportFoam):
    """Time-spectral periodic scalar transport (see module docstring)."""

    def __init__(self, option, topo, points):
        from dafoam_tpu.option import DAOption
        opt = option if isinstance(option, DAOption) else DAOption(option)
        ua = opt["unsteadyAdjoint"]
        self.n_inst = int(ua.get("nTimeInstances", 3))
        self.period = float(ua.get("periodicity", 1.0))
        # per-instance state names BEFORE the base builds the layout
        self.state_info = StateInfo(
            vol_scalar=tuple(f"T{n}" for n in range(self.n_inst)))
        super().__init__(opt, topo, points)
        self._D_np = spectral_derivative_matrix(self.n_inst, self.period)
        self._D = jnp.asarray(self._D_np, self.dtype)
        # pseudo-time stabilization of the block Gauss-Seidel primal:
        # the explicit spectral coupling has row magnitude sum_m |D_nm|
        # ~ (pi/T) N ln N, which for high reduced frequency rivals the
        # spatial operator's diagonal and the plain sweep diverges. An
        # implicit vol/dtau with dtau = factor / max_n sum_m |D_nm|
        # guarantees the coupling is diagonally dominated regardless of
        # the physics; factor from unsteadyAdjoint.pseudoTimeFactor.
        row = float(np.max(np.sum(np.abs(self._D_np), axis=1)))
        fac = float(ua.get("pseudoTimeFactor", 1.0))
        self._pseudo_inv_dt = row / fac if fac > 0.0 else 0.0

    # -- per-instance plumbing -----------------------------------------
    def _t_of(self, n: int) -> float:
        return n * self.period / self.n_inst

    def _assemble_at(self, T, inputs, geom, phi, t):
        """Parent _assemble with the instance's own BC time (multiFreq*
        BCs evaluate their oscillation at t)."""
        bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                        self.topo, geom, T, rank=0,
                        phi_b=phi[self.topo.n_internal:], t=t)
        DT = inputs["params"]["DT"]
        from dafoam_tpu.ops import fvm
        gamma_f = jnp.full((self.topo.n_faces,), DT, self.dtype)
        return fvm.div(geom, self.topo, phi, T, bco,
                       scheme=self.div_scheme) \
            - fvm.laplacian(geom, self.topo, gamma_f, T, bco)

    # -- state management ----------------------------------------------
    def init_state(self) -> dict:
        st = self.layout.zeros(self.dtype)
        t0 = self.option.get("initialFields", {}).get("T", 0.0)
        for name in st:
            st[name] = jnp.broadcast_to(jnp.asarray(t0, self.dtype),
                                        st[name].shape)
        return st

    def state_scales(self, geom) -> dict:
        s = jnp.asarray(self.option["normalizeStates"].get("T", 1.0),
                        self.dtype)
        return {f"T{n}": s for n in range(self.n_inst)}

    # -- coupled steady residual ---------------------------------------
    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        phi = self._phi(inputs, geom)
        ts = jnp.stack([state[f"T{n}"] for n in range(self.n_inst)])
        ddt = self._D @ ts                          # (N, nc), exact d/dt
        out = {}
        for n in range(self.n_inst):
            m = self._assemble_at(ts[n], inputs, geom, phi, self._t_of(n))
            out[f"T{n}"] = fvx.residual(m, ts[n], geom, self.topo) + ddt[n]
        return out

    # -- primal: block Gauss-Seidel over instances ---------------------
    def solve_primal(self, state, inputs):
        geom = self.geometry(inputs)
        phi = self._phi(inputs, geom)
        vol = geom.vol
        tol = self.option["primalMinResTol"]
        max_sweeps = self.option["primalMaxIters"]
        names = [f"T{n}" for n in range(self.n_inst)]

        def res_max(st):
            r = self.residuals(st, inputs)
            return jnp.max(jnp.stack([jnp.max(jnp.abs(v))
                                      for v in r.values()]))

        def body(c):
            st, it, _ = c
            ts = [st[nm] for nm in names]
            for n in range(self.n_inst):
                m = self._assemble_at(ts[n], inputs, geom, phi,
                                      self._t_of(n))
                # spectral coupling as explicit source (D_nn == 0), in
                # the volume-integrated convention of the fvm matrix
                ddt_n = sum(self._D[n, k] * ts[k]
                            for k in range(self.n_inst) if k != n)
                # explicit spectral source + implicit pseudo-time (the
                # vol/dtau terms cancel at convergence: they enter diag
                # and source symmetrically about the current iterate)
                pdt = self._pseudo_inv_dt
                m = m._replace(diag=m.diag + vol * pdt,
                               source=m.source - vol * ddt_n
                               + vol * pdt * ts[n])
                tn, _info = fvsolve.solve(m, ts[n], self.topo,
                                          symmetric=False, rel_tol=1e-12,
                                          max_iters=2000)
                ts[n] = tn
            st2 = dict(st, **{nm: ts[k] for k, nm in enumerate(names)})
            return st2, it + 1, res_max(st2)

        def cond(c):
            _, it, res = c
            return jnp.logical_and(it < max_sweeps, res > tol)

        st, it, res = jax.lax.while_loop(
            cond, body,
            (dict(state), jnp.asarray(0),
             jnp.asarray(jnp.inf, self.dtype)))
        return st, PrimalInfo(it, res, res <= tol,
                              jnp.logical_not(self.states_valid(st)))

    # -- objectives: DATimeOp reduction over the cycle -----------------
    def _instance_ctx(self, state, inputs, n, geom, phi):
        tn = state[f"T{n}"]
        bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                        self.topo, geom, tn, rank=0,
                        phi_b=phi[self.topo.n_internal:],
                        t=self._t_of(n))
        return {"state": {"T": tn}, "geom": geom, "topo": self.topo,
                "boundary": {"T": bc.boundary_value(bco, tn, self.topo)},
                "phi": phi, "aux": {}, "data": inputs.get("data", {})}

    def eval_function(self, name, state, inputs):
        cfg = self.option["function"][name]
        if cfg["type"] == "residualNorm":
            raise NotImplementedError(
                "residualNorm objectives are not defined for the "
                "time-spectral mode (the converged TS residual is zero "
                "by construction)")
        geom = self.geometry(inputs)
        phi = self._phi(inputs, geom)
        vals = jnp.stack([
            evaluate_function(cfg, self._instance_ctx(state, inputs, n,
                                                      geom, phi))
            for n in range(self.n_inst)])
        # every instance carries equal cycle weight: the "average" timeOp
        # defaults to the FULL window here (the reference's last-N-
        # fraction default is a transient-washout device that has no
        # meaning on a periodic orbit); an explicit timeOpFracStart
        # still wins
        cfg_ts = dict(cfg)
        cfg_ts.setdefault("timeOpFracStart", 0.0)
        return time_op(vals, cfg.get("timeOp", "average"), cfg_ts)
