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
        # Euler or backward (BDF2, reference ddtSchemeOrder 2)
        sch = self.option.get("ddtScheme", "Euler")
        self.ddt_scheme = "backward" if sch == "backward" else "Euler"
        self.ddt_order = 2 if self.ddt_scheme == "backward" else 1

    # -- unsteady momentum matrix (Euler/BDF2 ddt, no relaxation) ---------
    # BDF2 is expressed as a blend: ddt = ((1+b/2) W - (1+b) W1 + b/2 W2)/dt
    # with b=0 (Euler) or b=1 (BDF2). b may be TRACED (b = n>1), matching
    # OpenFOAM's 'backward' scheme which bootstraps Euler on step 1 — the
    # adjoint must linearize the same per-step scheme the primal ran.
    def _ddt_blend(self, psi, psi_old, psi_oldold, geom, b):
        v = geom.vol if psi.ndim == 1 else geom.vol[:, None]
        ni = self.topo.n_internal
        diagc = (1.0 + 0.5 * b) * v / self.dt
        src = v / self.dt * ((1.0 + b) * psi_old - 0.5 * b * psi_oldold)
        return fvx.FvMatrix(
            diag=jnp.zeros_like(psi) + diagc,
            lower=jnp.zeros((ni,), psi.dtype),
            upper=jnp.zeros((ni,), psi.dtype),
            source=jnp.zeros_like(psi) + src)

    def _ueqn_dt(self, state, W_old, inputs, geom, W_oldold=None,
                 bdf2=None):
        U, phi = state["U"], state["phi"]
        U_bco = self._bco_U(U, inputs, geom, phi)
        b = 0.0 if (W_oldold is None or self.ddt_order == 1) \
            else (1.0 if bdf2 is None else bdf2)
        Woo = W_old if W_oldold is None else W_oldold
        M = fvm.div(geom, self.topo, phi, U, U_bco,
                    scheme=self.div_u_scheme) \
            + self.turb.divdevreff(U, state, inputs, geom, U_bco) \
            + self._ddt_blend(U, W_old["U"], Woo["U"], geom, b)
        return M, U_bco

    def _model_ddt(self, W, W_old, W_oldold, k, bdf2=None):
        if self.ddt_order == 2 and W_oldold is not None:
            b = 1.0 if bdf2 is None else bdf2
            return ((1.0 + 0.5 * b) * W[k] - (1.0 + b) * W_old[k]
                    + 0.5 * b * W_oldold[k]) / self.dt
        return (W[k] - W_old[k]) / self.dt

    # -- residual R^n(W^n, W^{n-1}, W^{n-2}) ------------------------------
    def residuals_unsteady(self, W, W_old, W_oldold, inputs, n=None):
        geom = self.geometry(inputs)
        topo = self.topo
        if n is not None:
            # physical time of the state W (step n lives at t = n dt):
            # time-dependent BCs (multiFreq*/varyingVelocity*) read it
            inputs = {**inputs,
                      "t": jnp.asarray(n, self.dtype) * self.dt}
        bdf2 = None
        if self.ddt_order == 2 and n is not None:
            bdf2 = (n > 1).astype(self.dtype) if hasattr(n, "astype") \
                else self.dtype(float(n > 1))
        U, p, phi = W["U"], W["p"], W["phi"]
        UEqn, U_bco = self._ueqn_dt(
            W, W_old, inputs, geom,
            W_oldold=W_oldold if self.ddt_order == 2 else None,
            bdf2=bdf2)
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
                res_t[k] = res_t[k] + self._model_ddt(
                    W, W_old, W_oldold, k, bdf2=bdf2)
            out.update(res_t)
        geomv = geom
        return self._apply_res_norm(out, geomv)

    # -- one time step -----------------------------------------------------
    def _step(self, state_old, inputs, geom, state_oldold=None, t=None):
        lin = self.option["primalLinearSolver"]
        if t is not None:
            inputs = {**inputs, "t": t}

        def outer(_, state):
            UEqn, U_bco = self._ueqn_dt(state, state_old, inputs, geom,
                                        W_oldold=state_oldold)
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
                # BDF2 as an equivalent Euler step: (1.5 W - 2W1 + .5W2)/dt
                # = (W - (4W1 - W2)/3) / (dt/1.5)
                if state_oldold is None:
                    dt_t, old_t = self.dt, state_old
                else:
                    dt_t = self.dt / 1.5
                    old_t = jax.tree_util.tree_map(
                        lambda a, b: (4.0 * a - b) / 3.0, state_old,
                        state_oldold)
                st = self.turb.correct(st, inputs, geom, st["phi"],
                                       gradU=gradU,
                                       rel_tol=lin["turbRelTol"],
                                       max_iters=lin["turbMaxIters"],
                                       relax=1.0, dt=dt_t, old=old_t)
            return st

        return jax.lax.fori_loop(0, self.n_outer, outer, state_old)

    # -- time loop ----------------------------------------------------------
    def solve_primal_history(self, state0, inputs):
        geom = self.geometry(inputs)

        if self.ddt_order == 1:
            def scan_step(state, n):
                st = self._step(state, inputs, geom,
                                t=n.astype(self.dtype) * self.dt)
                return st, st

            stT, hist_steps = jax.lax.scan(scan_step, state0,
                                           jnp.arange(1, self.n_steps + 1))
            hist = jax.tree_util.tree_map(
                lambda a0, ah: jnp.concatenate([a0[None], ah], axis=0),
                state0, hist_steps)
            return stT, hist

        # BDF2: Euler bootstrap for step 1 (OpenFOAM 'backward' behavior)
        st1 = self._step(state0, inputs, geom, t=self.dt)

        def scan_step(carry, n):
            W, W_old = carry
            st = self._step(W, inputs, geom, state_oldold=W_old,
                            t=n.astype(self.dtype) * self.dt)
            return (st, W), st

        (stT, _), hist_steps = jax.lax.scan(
            scan_step, (st1, state0), jnp.arange(2, self.n_steps + 1))
        hist = jax.tree_util.tree_map(
            lambda a0, a1, ah: jnp.concatenate(
                [a0[None], a1[None], ah], axis=0),
            state0, st1, hist_steps)
        return stT, hist

    def solve_primal_checkpoints(self, state0, inputs, seg_len):
        """Forward pass storing only checkpoint TRIPLES (states at steps
        s*L, s*L-1, s*L-2) plus every step's function values — the memory
        side of the checkpoint/recompute reverse sweep (the reference
        writes every step to disk instead, DASolver.C:3193).

        Returns (stT, checkpoints (n_seg+1, 3, ...), func_vals dict)."""
        assert self.n_steps % seg_len == 0
        geom = self.geometry(inputs)
        fnames = list(self.option["function"].keys())

        def advance(carry, n):
            W, W_old = carry
            tn = n.astype(self.dtype) * self.dt
            if self.ddt_order == 2:
                st = jax.lax.cond(
                    n > 1,
                    lambda: self._step(W, inputs, geom, state_oldold=W_old,
                                       t=tn),
                    lambda: self._step(W, inputs, geom, t=tn))
            else:
                st = self._step(W, inputs, geom, t=tn)
            vals = jnp.stack(
                [self.eval_function(f, st, inputs) for f in fnames]) \
                if fnames else jnp.zeros((0,), self.dtype)
            return (st, W), (st, vals)

        def seg(carry, s):
            (W, W_old), _ = carry, None
            (Wn, Wn1), (hseg, vals) = jax.lax.scan(
                advance, (W, W_old),
                s * seg_len + 1 + jnp.arange(seg_len))
            ck = jax.tree_util.tree_map(
                lambda h: jnp.stack([h[-1], h[-2] if seg_len >= 2 else h[-1],
                                     h[-3] if seg_len >= 3 else h[0]]),
                hseg)
            return (Wn, Wn1), (ck, vals)

        n_seg = self.n_steps // seg_len
        (stT, _), (cks, vals) = jax.lax.scan(
            seg, (state0, state0), jnp.arange(n_seg))
        ck0 = jax.tree_util.tree_map(
            lambda a: jnp.stack([a, a, a]), state0)
        checkpoints = jax.tree_util.tree_map(
            lambda c0, c: jnp.concatenate([c0[None], c], 0), ck0, cks)
        func_vals = {f: vals.reshape(self.n_steps, -1)[:, i]
                     for i, f in enumerate(fnames)}
        return stT, checkpoints, func_vals

    def solve_primal(self, state, inputs):
        stT, hist = self.solve_primal_history(state, inputs)
        ok = self.states_valid(stT)
        W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
        res = self.residuals_unsteady(stT, W_old, W_old, inputs,
                                      n=jnp.asarray(self.n_steps))
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

    # -- unsteady adjoint preconditioner (segregated, amortized) ----------
    def unsteady_pc_assemble(self, W, W1, W2, inputs):
        """Per-equation operators linearized at step n (PC matrices only;
        the PCMatPrecomputeInterval analog rebuilds these every
        unsteadyAdjoint.PCMatUpdateInterval reverse steps)."""
        geom = self.geometry(inputs)
        UEqn, U_bco = self._ueqn_dt(
            W, W1, inputs, geom,
            W_oldold=W2 if self.ddt_order == 2 else None)
        _, _, _, _, pM, _ = self._projection(W, inputs, geom, UEqn, U_bco,
                                             W["U"])
        mats = {"U": UEqn, "p": pM}
        if self.turb.model_states:
            U_b = bc.boundary_value(U_bco, W["U"], self.topo)
            gradU = fvc.grad(geom, self.topo, W["U"], U_b)
            for k, (m, _sym) in self.turb.pc_matrices(
                    W, inputs, geom, W["phi"], gradU).items():
                mats[k] = m + fvm.ddt(geom, self.topo, W[k], W1[k],
                                      self.dt)
        return mats

    def _unsteady_pc_apply_fn(self, inputs):
        from dafoam_tpu.adjoint.precond import build_pc

        geom = self.geometry(inputs)
        scales = self.state_scales(geom)
        opt = dict(self.option["adjEqnOption"])
        # the unsteady reverse sweep rebuilds the PC per checkpoint segment
        # and has no standing matT closure: clamp the coupled variant to
        # its block-diagonal line-implicit form
        if opt.get("pcType") == "coupledLine":
            opt["pcType"] = "lineJacobi"

        def pc_apply(mats, r):
            matrices = {k: (m, k == "p") for k, m in mats.items()}
            pc = build_pc(matrices, self.topo, geom, scales, opt)
            if getattr(pc, "needs_opT", False):
                pc = pc(None)   # sweeps==1: the operator is never used
            return pc(r)

        return pc_apply

    def _unsteady_adj_cfg(self, inputs, func_name, vals):
        cfg = self.option["function"][func_name]
        weights = jax.grad(
            lambda v: time_op(v, cfg.get("timeOp", "final"), cfg))(vals)
        geom = self.geometry(inputs)
        scales = self.state_scales(geom)
        opt = self.option["adjEqnOption"]
        pc_assemble = pc_apply = None
        if opt.get("pcType", "none") not in ("none", None):
            pc_assemble = lambda W, W1, W2, x, n: \
                self.unsteady_pc_assemble(W, W1, W2, x)    # noqa: E731
            pc_apply = self._unsteady_pc_apply_fn(inputs)
        pc_interval = int(self.option["unsteadyAdjoint"]
                          .get("PCMatUpdateInterval", 1))
        return weights, scales, opt, pc_assemble, pc_apply, pc_interval

    def solve_unsteady_adjoint(self, hist, inputs, func_name):
        """Total derivatives of the time-reduced function w.r.t. inputs."""
        J, vals = self.eval_function_history(func_name, hist, inputs)
        (weights, scales, opt, pc_assemble, pc_apply,
         pc_interval) = self._unsteady_adj_cfg(inputs, func_name, vals)
        totals, resids = unsteady_adjoint_totals(
            lambda W, Wo, Woo, x, n: self.residuals_unsteady(
                W, Wo, Woo, x, n),
            lambda W, x, n: self.eval_function(func_name, W, x),
            hist, inputs, weights, time_dep=True,
            ddt_order=self.ddt_order,
            state_scales=scales, res_scales=scales,
            restart=opt["gmresRestart"], rel_tol=opt["gmresRelTol"],
            abs_tol=opt["gmresAbsTol"], max_iters=opt["gmresMaxIters"],
            pc_assemble=pc_assemble, pc_apply=pc_apply,
            pc_interval=pc_interval)
        return totals, resids

    def solve_unsteady_adjoint_checkpointed(self, state0, inputs,
                                            func_name, seg_len):
        """Long-history unsteady adjoint: checkpoint/recompute reverse
        sweep — memory O(seg_len + T/seg_len) states instead of O(T)."""
        from dafoam_tpu.adjoint.unsteady import (
            unsteady_adjoint_totals_checkpointed)

        stT, checkpoints, func_vals = self.solve_primal_checkpoints(
            state0, inputs, seg_len)
        vals = func_vals[func_name]
        J = time_op(vals, self.option["function"][func_name]
                    .get("timeOp", "final"),
                    self.option["function"][func_name])
        (weights, scales, opt, pc_assemble, pc_apply,
         pc_interval) = self._unsteady_adj_cfg(inputs, func_name, vals)
        geom = self.geometry(inputs)

        def advance(W, x, n):
            # NOTE: within a segment only step 1 needs the Euler
            # bootstrap; segments never contain it except the first, whose
            # checkpoint triple repeats the IC so BDF2 with W2=W1=IC is
            # the Euler step scaled — recompute exactly like the primal:
            return self._step(W, x, geom,
                              t=jnp.asarray(n, self.dtype) * self.dt)

        if self.ddt_order == 2:
            raise NotImplementedError(
                "checkpointed sweep currently supports ddt_order=1 "
                "(Euler); use the in-memory sweep for BDF2")
        totals, resids = unsteady_adjoint_totals_checkpointed(
            advance,
            lambda W, Wo, Woo, x, n: self.residuals_unsteady(
                W, Wo, Woo, x, n),
            lambda W, x, n: self.eval_function(func_name, W, x),
            checkpoints, seg_len, self.n_steps, inputs, weights,
            time_dep=True,
            ddt_order=1, state_scales=scales, res_scales=scales,
            restart=opt["gmresRestart"], rel_tol=opt["gmresRelTol"],
            abs_tol=opt["gmresAbsTol"], max_iters=opt["gmresMaxIters"],
            pc_assemble=pc_assemble, pc_apply=pc_apply,
            pc_interval=pc_interval)
        return totals, resids, float(J)
