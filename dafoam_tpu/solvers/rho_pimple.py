"""Unsteady compressible PIMPLE solver + time-accurate adjoint.

Capability parity with the reference's DARhoPimpleFoam
(src/adjoint/DASolver/DARhoPimpleFoam/, residual
DAResidualRhoPimpleFoam.C): the DARhoSimpleFoam equation set with
backward-Euler time terms —

  momentum:   + (rho U - rho_o U_o)/dt
  energy:     + Cp (rho T - rho_o T_o)/dt
  continuity: + (psi p - psi_o p_o)/dt   (implicit in p via psi = 1/RT)

and the same lax.scan / reverse-scan structure as DAPimpleFoam.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.adjoint.unsteady import unsteady_adjoint_totals
from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import PrimalInfo
from dafoam_tpu.solvers.rho_simple import DARhoSimpleFoam
from dafoam_tpu.timeops import time_op


class DARhoPimpleFoam(DARhoSimpleFoam):

    def __init__(self, option, topo, points):
        super().__init__(option, topo, points)
        self.dt = float(self.option["deltaT"])
        self.n_steps = int(round(float(self.option["endTime"]) / self.dt))
        pcfg = self.option.get("pimple", {}) or {}
        self.n_outer = pcfg.get("nOuterCorrectors", 3)
        self.n_corr = pcfg.get("nCorrectors", 2)

    # -- time-term helpers --------------------------------------------------
    def _add_ddt_U(self, M, W, W_old, inputs, geom):
        rho = self.rho_of(W, inputs)
        rho_o = self.rho_of(W_old, inputs)
        v = geom.vol[:, None]
        diag = M.diag + (rho * geom.vol / self.dt)[:, None]
        src = M.source + (rho_o[:, None] * W_old["U"]) * v / self.dt
        return M._replace(diag=diag, source=src)

    def _add_ddt_T(self, M, W, W_old, inputs, geom):
        Cp, R, mu, Pr, Prt = self._thermo(inputs)
        rho = self.rho_of(W, inputs)
        rho_o = self.rho_of(W_old, inputs)
        diag = M.diag + Cp * rho * geom.vol / self.dt
        src = M.source + Cp * rho_o * W_old["T"] * geom.vol / self.dt
        return M._replace(diag=diag, source=src)

    def _add_ddt_p(self, M, W, W_old, inputs, geom):
        """Mass balance is ddt(rho) + div(phi) = 0 with
        div(phi)V = div(phiHbyA) - lap(p); the pEqn convention solves
        contribution = lap(p) - div(phiHbyA) = 0, so ddt(rho) enters with a
        MINUS sign (which also strengthens the negative laplacian
        diagonal)."""
        Cp, R, mu, Pr, Prt = self._thermo(inputs)
        psi = 1.0 / (R * W["T"])
        psi_o = 1.0 / (R * W_old["T"])
        diag = M.diag - psi * geom.vol / self.dt
        src = M.source - psi_o * W_old["p"] * geom.vol / self.dt
        return M._replace(diag=diag, source=src)

    # -- residual -------------------------------------------------------------
    def residuals_unsteady(self, W, W_old, W_oldold, inputs):
        geom = self.geometry(inputs)
        topo = self.topo
        U, p, T, phi = W["U"], W["p"], W["T"], W["phi"]
        UEqn, U_bco = self._ueqn(W, inputs, geom)
        UEqn = self._add_ddt_U(UEqn, W, W_old, inputs, geom)
        p_bco0 = self._bco("p", p, inputs, geom, phi, 0)
        p_b = bc.boundary_value(p_bco0, p, topo)
        gradp = fvc.grad(geom, topo, p, p_b)
        r_U = fvx.residual(UEqn, U, geom, topo) + gradp

        rAU, rr_f, HbyA, phiHbyA, pM, p_bco, flux_fn = self._projection(
            W, inputs, geom, UEqn, U_bco, U)
        pM = self._add_ddt_p(pM, W, W_old, inputs, geom)
        r_p = fvx.residual(pM, p, geom, topo)
        r_phi = flux_fn(p) - phi

        TEqn, T_bco = self._teqn(W, inputs, geom)
        TEqn = self._add_ddt_T(TEqn, W, W_old, inputs, geom)
        r_T = fvx.residual(TEqn, T, geom, topo)
        out = {"U": r_U, "p": r_p, "T": r_T, "phi": r_phi}
        return self._apply_res_norm(out, geom)

    # -- one time step ------------------------------------------------------
    def _step(self, state_old, inputs, geom):
        lin = self.option["primalLinearSolver"]

        def outer(_, state):
            UEqn, U_bco = self._ueqn(state, inputs, geom)
            UEqn = self._add_ddt_U(UEqn, state, state_old, inputs, geom)
            p = state["p"]
            p_bco = self._bco("p", p, inputs, geom, state["phi"], 0)
            p_b = bc.boundary_value(p_bco, p, self.topo)
            gradp = fvc.grad(geom, self.topo, p, p_b)
            rhs_U = -gradp * geom.vol[:, None]
            U_pred, _ = fvsolve.solve(UEqn, state["U"], self.topo,
                                      symmetric=False,
                                      rel_tol=lin["uRelTol"],
                                      max_iters=lin["uMaxIters"], rhs=rhs_U)
            st = dict(state, U=self._bound("U", U_pred))

            TEqn, _ = self._teqn(st, inputs, geom)
            TEqn = self._add_ddt_T(TEqn, st, state_old, inputs, geom)
            T_new, _ = fvsolve.solve(TEqn, st["T"], self.topo,
                                     symmetric=False,
                                     rel_tol=lin["turbRelTol"],
                                     max_iters=lin["turbMaxIters"])
            st = dict(st, T=self._bound("T", T_new))

            def corr(_, st):
                rAU, rr_f, HbyA, phiHbyA, pM, p_bco2, flux_fn = \
                    self._projection(st, inputs, geom, UEqn, U_bco, st["U"])
                pM = self._add_ddt_p(pM, st, state_old, inputs, geom)
                p_new, _ = fvsolve.solve(pM, st["p"], self.topo,
                                         symmetric=not self.transonic,
                                         rel_tol=lin["pRelTol"],
                                         max_iters=lin["pMaxIters"])
                p_new = self._bound("p", p_new)
                phi_new = flux_fn(p_new)
                pb3 = self._bco("p", p_new, inputs, geom, phi_new, 0)
                p_b3 = bc.boundary_value(pb3, p_new, self.topo)
                gradp3 = fvc.grad(geom, self.topo, p_new, p_b3)
                U_new = self._bound("U", HbyA - rAU[:, None] * gradp3)
                return dict(st, U=U_new, p=p_new, phi=phi_new)

            return jax.lax.fori_loop(0, self.n_corr, corr, st)

        return jax.lax.fori_loop(0, self.n_outer, outer, state_old)

    # -- time loop (same structure as DAPimpleFoam) ---------------------------
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
        mx = jnp.max(jnp.asarray([jnp.max(jnp.abs(v)) for v in
                                  res.values()]))
        return stT, PrimalInfo(jnp.asarray(self.n_steps), mx, ok,
                               jnp.logical_not(ok))

    def eval_function_history(self, name, hist, inputs):
        cfg = self.option["function"][name]

        def f_at(n):
            W = jax.tree_util.tree_map(lambda a: a[n], hist)
            return self.eval_function(name, W, inputs)

        vals = jax.lax.map(f_at, jnp.arange(1, self.n_steps + 1))
        return time_op(vals, cfg.get("timeOp", "final"), cfg), vals

    def solve_unsteady_adjoint(self, hist, inputs, func_name):
        cfg = self.option["function"][func_name]
        J, vals = self.eval_function_history(func_name, hist, inputs)
        weights = jax.grad(
            lambda v: time_op(v, cfg.get("timeOp", "final"), cfg))(vals)
        geom = self.geometry(inputs)
        scales = self.state_scales(geom)
        opt = self.option["adjEqnOption"]
        return unsteady_adjoint_totals(
            lambda W, Wo, Woo, x: self.residuals_unsteady(W, Wo, Woo, x),
            lambda W, x: self.eval_function(func_name, W, x),
            hist, inputs, weights, ddt_order=1,
            state_scales=scales, res_scales=scales,
            restart=opt["gmresRestart"], rel_tol=opt["gmresRelTol"],
            abs_tol=opt["gmresAbsTol"], max_iters=opt["gmresMaxIters"])
