"""Unsteady incompressible PIMPLE with dynamic (moving) mesh — ALE.

Capability parity with the reference's DAPimpleDyMFoam
(src/adjoint/DASolver/DAPimpleDyMFoam/DAPimpleDyMFoam.C, 398 LoC +
DASolver.C:4166 initDynamicMesh): per-step mesh motion, ALE face fluxes
(convection by the flux RELATIVE to the mesh, OpenFOAM
fvc::makeRelative), moving-wall no-slip velocities, and the unsteady
adjoint sweeping the per-step mesh positions (the reference re-reads them
from disk, pyDAFoam.py:1288 readDynamicMeshPoints; here points(t) is an
analytic differentiable function of the motion parameters, so dJ/d(motion)
falls out of the same vjp).

Mesh flux (space conservation): faces are fan-triangulated about the
vertex-average point (consistent with mesh.geometry); for linear-in-time
vertex paths the swept volume of each triangle is EXACT by Simpson's rule
   V_swept = (A(0) + 4 A(1/2) + A(1))/6 . (cbar1 - cbar0)
(A = triangle area vector, cbar = vertex mean), because A(t) is quadratic
and the mean velocity constant. meshPhi = V_swept/dt.

Motion types (option "dynamicMesh"): "translation" (plunge)
  disp(t) = amp * sin(2 pi f t) * dir,  vel = d(disp)/dt
with amp differentiable via inputs["params"]["dyMeshAmp"].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.adjoint.unsteady import unsteady_adjoint_totals
from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.mesh.geometry import compute_geometry
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import PrimalInfo
from dafoam_tpu.solvers.pimple import DAPimpleFoam
from dafoam_tpu.timeops import time_op


class DAPimpleDyMFoam(DAPimpleFoam):

    def __init__(self, option, topo, points):
        super().__init__(option, topo, points)
        self.dym = self.option.get("dynamicMesh", {}) or {}
        if not self.dym.get("active", False):
            raise ValueError("DAPimpleDyMFoam needs dynamicMesh.active")
        self.moving_patches = tuple(self.dym.get("movingPatches", []))

    # -- motion ------------------------------------------------------------
    def make_inputs(self):
        t = super().make_inputs()
        t["params"]["dyMeshAmp"] = jnp.asarray(
            self.dym.get("amplitude", 0.0), self.dtype)
        return t

    def motion(self, inputs, t):
        """-> (point displacement (np,3), point velocity (np,3)) at time t."""
        mtype = self.dym.get("motionType", "translation")
        amp = inputs["params"]["dyMeshAmp"]
        freq = self.dym.get("frequency", 1.0)
        if mtype == "translation":
            d = jnp.asarray(self.dym.get("direction", [0.0, 1.0, 0.0]),
                            self.dtype)
            w = 2.0 * jnp.pi * freq
            disp = amp * jnp.sin(w * t) * d
            vel = amp * w * jnp.cos(w * t) * d
            n = self.points.shape[0]
            return (jnp.broadcast_to(disp, (n, 3)),
                    jnp.broadcast_to(vel, (n, 3)))
        raise NotImplementedError(mtype)

    def points_at(self, inputs, t):
        disp, _ = self.motion(inputs, t)
        return inputs["points"] + disp

    # -- swept-volume mesh flux ---------------------------------------------
    def mesh_phi(self, pts_old, pts_new, dt):
        """(nf,) swept volume flux of every face between configurations."""
        topo = self.topo
        fv = topo.face_verts                       # (nf, K)
        nvf = jnp.asarray(topo.face_nverts, self.dtype)

        def tri_areas(pts):
            P = pts[fv]                            # (nf, K, 3)
            ctr = P.sum(axis=1) / nvf[:, None] \
                - (jnp.asarray(topo.face_nverts)[:, None] != fv.shape[1]) \
                * 0.0
            # padding repeats vertex 0: subtract its overcount from the sum
            pad = (fv.shape[1] - jnp.asarray(topo.face_nverts,
                                             self.dtype))[:, None]
            ctr = (P.sum(axis=1) - pad * pts[fv[:, 0]]) / nvf[:, None]
            a = P - ctr[:, None, :]
            b = jnp.roll(P, -1, axis=1) - ctr[:, None, :]
            # padded slots give degenerate (zero-area) triangles
            return 0.5 * jnp.cross(a, b), ctr, P

        A0, c0, P0 = tri_areas(pts_old)
        A1, c1, P1 = tri_areas(pts_new)
        Pm = 0.5 * (P0 + P1)
        cm = 0.5 * (c0 + c1)
        am = Pm - cm[:, None, :]
        bm = jnp.roll(Pm, -1, axis=1) - cm[:, None, :]
        Am = 0.5 * jnp.cross(am, bm)
        # per-triangle mean velocity * dt = displacement of the tri mean
        tbar0 = (P0 + jnp.roll(P0, -1, axis=1) + c0[:, None, :]) / 3.0
        tbar1 = (P1 + jnp.roll(P1, -1, axis=1) + c1[:, None, :]) / 3.0
        dv = tbar1 - tbar0
        swept = jnp.einsum("fki,fki->f", (A0 + 4.0 * Am + A1) / 6.0, dv)
        return swept / dt

    # -- per-step inputs (moving-wall BC) ------------------------------------
    def _inputs_at(self, inputs, t):
        """Inject the moving-wall velocity into the U BC values."""
        if not self.moving_patches:
            return inputs
        _, vel = self.motion(inputs, t)
        out = dict(inputs)
        out["bc"] = {k: dict(v) for k, v in inputs["bc"].items()}
        ub = dict(out["bc"].get("U", {}))
        for pname in self.moving_patches:
            ub[pname] = vel[0]        # rigid: same velocity everywhere
        out["bc"]["U"] = ub
        return out

    # -- ALE momentum matrix -------------------------------------------------
    def _ueqn_ale(self, state, W_old, inputs_t, geom, geom_old, mesh_phi):
        U, phi = state["U"], state["phi"]
        U_bco = self._bco_U(U, inputs_t, geom, phi)
        phi_rel = phi - mesh_phi
        M = fvm.div(geom, self.topo, phi_rel, U, U_bco,
                    scheme=self.div_u_scheme) \
            + self.turb.divdevreff(U, state, inputs_t, geom, U_bco)
        # ALE Euler ddt: (V_new U - V_old U_old)/dt, per-volume form
        rdt = 1.0 / self.dt
        M = M + fvx.FvMatrix(
            diag=jnp.broadcast_to((geom.vol * rdt)[:, None], U.shape),
            lower=jnp.zeros((self.topo.n_internal,), self.dtype),
            upper=jnp.zeros((self.topo.n_internal,), self.dtype),
            source=(geom_old.vol * rdt)[:, None] * W_old["U"])
        return M, U_bco

    # -- one ALE time step ----------------------------------------------------
    def _step_ale(self, state_old, inputs, n):
        lin = self.option["primalLinearSolver"]
        t_new = n * self.dt
        t_old = (n - 1) * self.dt
        pts_old = self.points_at(inputs, t_old)
        pts_new = self.points_at(inputs, t_new)
        geom = compute_geometry(pts_new, self.topo)
        geom_old = compute_geometry(pts_old, self.topo)
        mesh_phi = self.mesh_phi(pts_old, pts_new, self.dt)
        inp_t = self._inputs_at(inputs, t_new)

        def outer(_, state):
            UEqn, U_bco = self._ueqn_ale(state, state_old, inp_t, geom,
                                         geom_old, mesh_phi)
            p = state["p"]
            p_bco = self._bco_p(p, inp_t, geom, state["phi"])
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
                    st, inp_t, geom, UEqn, U_bco, st["U"])
                p_new, _ = fvsolve.solve(pM, st["p"], self.topo,
                                         symmetric=True,
                                         rel_tol=lin["pRelTol"],
                                         max_iters=lin["pMaxIters"])
                phi_new = phiHbyA - fvm.laplacian_flux(
                    geom, self.topo, rAU_f, p_new, p_bco2)
                pb2 = self._bco_p(p_new, inp_t, geom, phi_new)
                p_b2 = bc.boundary_value(pb2, p_new, self.topo)
                gradp2 = fvc.grad(geom, self.topo, p_new, p_b2)
                U_new = HbyA - rAU[:, None] * gradp2
                return dict(st, U=U_new, p=p_new, phi=phi_new)

            st = jax.lax.fori_loop(0, self.n_corr, corr, st)
            if self.turb.model_states:
                U_bco2 = self._bco_U(st["U"], inp_t, geom, st["phi"])
                U_b = bc.boundary_value(U_bco2, st["U"], self.topo)
                gradU = fvc.grad(geom, self.topo, st["U"], U_b)
                st = self.turb.correct(st, inp_t, geom, st["phi"],
                                       gradU=gradU,
                                       rel_tol=lin["turbRelTol"],
                                       max_iters=lin["turbMaxIters"],
                                       relax=1.0, dt=self.dt,
                                       old=state_old)
            return st

        return jax.lax.fori_loop(0, self.n_outer, outer, state_old)

    # -- time loop --------------------------------------------------------------
    def solve_primal_history(self, state0, inputs):
        def scan_step(state, n):
            st = self._step_ale(state, inputs, n)
            return st, st

        stT, hist_steps = jax.lax.scan(
            scan_step, state0, jnp.arange(1, self.n_steps + 1))
        hist = jax.tree_util.tree_map(
            lambda a0, ah: jnp.concatenate([a0[None], ah], axis=0),
            state0, hist_steps)
        return stT, hist

    # -- time-dependent residual --------------------------------------------
    def residuals_unsteady_n(self, W, W_old, W_oldold, inputs, n):
        t_new = n * self.dt
        t_old = (n - 1) * self.dt
        pts_old = self.points_at(inputs, t_old)
        pts_new = self.points_at(inputs, t_new)
        geom = compute_geometry(pts_new, self.topo)
        geom_old = compute_geometry(pts_old, self.topo)
        mesh_phi = self.mesh_phi(pts_old, pts_new, self.dt)
        inp_t = self._inputs_at(inputs, t_new)
        topo = self.topo
        U, p, phi = W["U"], W["p"], W["phi"]
        UEqn, U_bco = self._ueqn_ale(W, W_old, inp_t, geom, geom_old,
                                     mesh_phi)
        p_bco0 = self._bco_p(p, inp_t, geom, phi)
        p_b = bc.boundary_value(p_bco0, p, topo)
        gradp = fvc.grad(geom, topo, p, p_b)
        r_U = fvx.residual(UEqn, U, geom, topo) + gradp
        rAU, rAU_f, HbyA, phiHbyA, pM, p_bco = self._projection(
            W, inp_t, geom, UEqn, U_bco, U)
        r_p = fvx.residual(pM, p, geom, topo)
        p_flux = fvm.laplacian_flux(geom, topo, rAU_f, p, p_bco)
        r_phi = phiHbyA - p_flux - phi
        out = {"U": r_U, "p": r_p, "phi": r_phi}
        if self.turb.model_states:
            U_b = bc.boundary_value(U_bco, U, topo)
            gradU = fvc.grad(geom, topo, U, U_b)
            res_t = self.turb.residuals(W, inp_t, geom, phi, gradU=gradU)
            for k in self.turb.model_states:
                res_t[k] = res_t[k] + (W[k] - W_old[k]) / self.dt
            out.update(res_t)
        return self._apply_res_norm(out, geom)

    def solve_primal(self, state, inputs):
        stT, hist = self.solve_primal_history(state, inputs)
        ok = self.states_valid(stT)
        W_old = jax.tree_util.tree_map(lambda a: a[-2], hist)
        res = self.residuals_unsteady_n(stT, W_old, W_old, inputs,
                                        jnp.asarray(self.n_steps))
        mx = jnp.max(jnp.asarray([jnp.max(jnp.abs(v))
                                  for v in res.values()]))
        return stT, PrimalInfo(jnp.asarray(self.n_steps), mx, ok,
                               jnp.logical_not(ok))

    # -- per-step function on the step-n geometry -----------------------------
    def eval_function_n(self, name, W, inputs, n):
        inp_t = self._inputs_at(inputs, n * self.dt)
        inp_t = dict(inp_t)
        inp_t["points"] = self.points_at(inputs, n * self.dt)
        return self.eval_function(name, W, inp_t)

    def eval_function_history(self, name, hist, inputs):
        cfg = self.option["function"][name]
        T = self.n_steps

        def f_at(n):
            W = jax.tree_util.tree_map(lambda a: a[n], hist)
            return self.eval_function_n(name, W, inputs, n)

        vals = jax.lax.map(f_at, jnp.arange(1, T + 1))
        return time_op(vals, cfg.get("timeOp", "final"), cfg), vals

    def solve_unsteady_adjoint(self, hist, inputs, func_name):
        cfg = self.option["function"][func_name]
        J, vals = self.eval_function_history(func_name, hist, inputs)
        weights = jax.grad(
            lambda v: time_op(v, cfg.get("timeOp", "final"), cfg))(vals)
        geom = self.geometry(inputs)
        scales = self.state_scales(geom)
        opt = self.option["adjEqnOption"]
        totals, resids = unsteady_adjoint_totals(
            lambda W, Wo, Woo, x, n: self.residuals_unsteady_n(
                W, Wo, Woo, x, n),
            lambda W, x, n: self.eval_function_n(func_name, W, x, n),
            hist, inputs, weights,
            ddt_order=1, time_dep=True,
            state_scales=scales, res_scales=scales,
            restart=opt["gmresRestart"], rel_tol=opt["gmresRelTol"],
            abs_tol=opt["gmresAbsTol"], max_iters=opt["gmresMaxIters"])
        return totals, resids
