"""Unsteady incompressible PIMPLE solver + time-accurate adjoint.

Capability parity with the reference's DAPimpleFoam
(src/adjoint/DASolver/DAPimpleFoam/, residual DAResidualPimpleFoam.C) and
its unsteady adjoint driver (mphys_dafoam.py:1250 DAFoamBuilderUnsteady /
:1390 reverse sweep). TPU-native structure:

- primal: lax.scan over time steps; each step is a fixed number of PIMPLE
  outer correctors (momentum predictor + nCorrectors pressure corrections);
- the full state history is stacked in device memory (the reference writes
  OpenFOAM time directories and re-reads them per reverse step);
- adjoint: dafoam_tpu.adjoint.unsteady reverse scan; per-step function
  values are reduced by dafoam_tpu.timeops (DATimeOp parity) and the
  dF-scaling weights come from jax.grad of that reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.adjoint.unsteady import unsteady_adjoint_totals
from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import PrimalInfo
from dafoam_tpu.solvers.simple import DASimpleFoam
from dafoam_tpu.timeops import time_op


class DAPimpleFoam(DASimpleFoam):

    def __init__(self, option, topo, points):
        super().__init__(option, topo, points)
        self.dt = float(self.option["deltaT"])
        self.n_steps = int(round(float(self.option["endTime"]) / self.dt))
        pcfg = self.option.get("pimple", {}) or {}
        self.n_outer = pcfg.get("nOuterCorrectors", 3)
        self.n_corr = pcfg.get("nCorrectors", 2)

    # -- unsteady momentum matrix (Euler ddt, no relaxation) -------------
    def _ueqn_dt(self, state, W_old, inputs, geom):
        U, phi = state["U"], state["phi"]
        U_bco = self._bco_U(U, inputs, geom, phi)
        scheme = self.div_u_scheme
        M = fvm.div(geom, self.topo, phi, U, U_bco, scheme=scheme) \
            + self.turb.divdevreff(U, state, inputs, geom, U_bco) \
            + fvm.ddt(geom, self.topo, U, W_old["U"], self.dt)
        return M, U_bco

    # -- residual R^n(W^n, W^{n-1}, W^{n-2}) ------------------------------
    def residuals_unsteady(self, W, W_old, W_oldold, inputs):
        geom = self.geometry(inputs)
        topo = self.topo
        U, p, phi = W["U"], W["p"], W["phi"]
        UEqn, U_bco = self._ueqn_dt(W, W_old, inputs, geom)
        p_bco0 = self._bco_p(p, inputs, geom, phi)
        p_b = bc.boundary_value(p_bco0, p, topo)
        gradp = fvc.grad(geom, topo, p, p_b)
        r_U = fvx.residual(UEqn, U, geom, topo) + gradp
        rAU, rAU_f, HbyA, phiHbyA, pM, p_bco = self._projection(
            W, inputs, geom, UEqn, U_bco, U)
        r_p = fvx.residual(pM, p, geom, topo)
        p_flux = fvm.laplacian_flux(geom, topo, rAU_f, p, p_bco)
        r_phi = phiHbyA - p_flux - phi
        out = {"U": r_U, "p": r_p, "phi": r_phi}
        if self.turb.model_states:
            U_b = bc.boundary_value(U_bco, U, topo)
            gradU = fvc.grad(geom, topo, U, U_b)
            res_t = self.turb.residuals(W, inputs, geom, phi, gradU=gradU)
            # add ddt of the model states
            for k in self.turb.model_states:
                res_t[k] = res_t[k] + (W[k] - W_old[k]) / self.dt
            out.update(res_t)
        geomv = geom
        return self._apply_res_norm(out, geomv)

    # -- one time step -----------------------------------------------------
    def _step(self, state_old, inputs, geom):
        lin = self.option["primalLinearSolver"]

        def outer(_, state):
            UEqn, U_bco = self._ueqn_dt(state, state_old, inputs, geom)
            p = state["p"]
            p_bco = self._bco_p(p, inputs, geom, state["phi"])
            p_b = bc.boundary_value(p_bco, p, self.topo)
            gradp = fvc.grad(geom, self.topo, p, p_b)
            rhs_U = -gradp * geom.vol[:, None]
            U_pred, _ = fvsolve.solve(UEqn, state["U"], self.topo,
                                      symmetric=False,
                                      rel_tol=lin["uRelTol"],
                                      max_iters=lin["uMaxIters"], rhs=rhs_U)
            st = dict(state, U=U_pred)

            def corr(_, st):
                rAU, rAU_f, HbyA, phiHbyA, pM, p_bco2 = self._projection(
                    st, inputs, geom, UEqn, U_bco, st["U"])
                p_new, _ = fvsolve.solve(pM, st["p"], self.topo,
                                         symmetric=True,
                                         rel_tol=lin["pRelTol"],
                                         max_iters=lin["pMaxIters"])
                phi_new = phiHbyA - fvm.laplacian_flux(
                    geom, self.topo, rAU_f, p_new, p_bco2)
                pb2 = self._bco_p(p_new, inputs, geom, phi_new)
                p_b2 = bc.boundary_value(pb2, p_new, self.topo)
                gradp2 = fvc.grad(geom, self.topo, p_new, p_b2)
                U_new = HbyA - rAU[:, None] * gradp2
                return dict(st, U=U_new, p=p_new, phi=phi_new)

            st = jax.lax.fori_loop(0, self.n_corr, corr, st)

            if self.turb.model_states:
                U_bco2 = self._bco_U(st["U"], inputs, geom, st["phi"])
                U_b = bc.boundary_value(U_bco2, st["U"], self.topo)
                gradU = fvc.grad(geom, self.topo, st["U"], U_b)
                st = self.turb.correct(st, inputs, geom, st["phi"],
                                       gradU=gradU,
                                       rel_tol=lin["turbRelTol"],
                                       max_iters=lin["turbMaxIters"],
                                       relax=1.0, dt=self.dt,
                                       old=state_old["nuTilda"])
            return st

        return jax.lax.fori_loop(0, self.n_outer, outer, state_old)

    # -- time loop ----------------------------------------------------------
    def solve_primal_history(self, state0, inputs):
        geom = self.geometry(inputs)

        def scan_step(state, _):
            st = self._step(state, inputs, geom)
            return st, st

        stT, hist_steps = jax.lax.scan(scan_step, state0, None,
                                       length=self.n_steps)
        hist = jax.tree_util.tree_map(
            lambda a0, ah: jnp.concatenate([a0[None], ah], axis=0),
            state0, hist_steps)
        return stT, hist

    def solve_primal(self, state, inputs):
        stT, hist = self.solve_primal_history(state, inputs)
        ok = self.states_valid(stT)
        W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
        res = self.residuals_unsteady(stT, W_old, W_old, inputs)
        mx = jnp.max(jnp.asarray(
            [jnp.max(jnp.abs(v)) for v in res.values()]))
        return stT, PrimalInfo(jnp.asarray(self.n_steps), mx, ok,
                               jnp.logical_not(ok))

    # -- unsteady functions ---------------------------------------------------
    def eval_function_history(self, name, hist, inputs):
        cfg = self.option["function"][name]
        T = self.n_steps

        def f_at(n):
            W = jax.tree_util.tree_map(lambda a: a[n], hist)
            return self.eval_function(name, W, inputs)

        # lax.map (scan-based): jax.custom_derivatives.linear_call
        # primitives in the FV core have no vmap batching rule
        vals = jax.lax.map(f_at, jnp.arange(1, T + 1))
        return time_op(vals, cfg.get("timeOp", "final"), cfg), vals

    def solve_unsteady_adjoint(self, hist, inputs, func_name):
        """Total derivatives of the time-reduced function w.r.t. inputs."""
        cfg = self.option["function"][func_name]
        J, vals = self.eval_function_history(func_name, hist, inputs)
        weights = jax.grad(
            lambda v: time_op(v, cfg.get("timeOp", "final"), cfg))(vals)
        geom = self.geometry(inputs)
        scales = self.state_scales(geom)
        opt = self.option["adjEqnOption"]
        totals, resids = unsteady_adjoint_totals(
            lambda W, Wo, Woo, x: self.residuals_unsteady(W, Wo, Woo, x),
            lambda W, x: self.eval_function(func_name, W, x),
            hist, inputs, weights,
            ddt_order=1,
            state_scales=scales, res_scales=scales,
            restart=opt["gmresRestart"], rel_tol=opt["gmresRelTol"],
            abs_tol=opt["gmresAbsTol"], max_iters=opt["gmresMaxIters"])
        return totals, resids
