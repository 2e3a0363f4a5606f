"""DAIrkPimpleFoam: implicit Runge-Kutta (Radau IIA, 2-stage) PIMPLE.

Capability parity with the reference's DAIrkPimpleFoam
(src/adjoint/DASolver/DAIrkPimpleFoam/DAIrkPimpleFoam.C:1-616): the Radau23
collocation scheme expressed through its differentiation matrix

    stage 1 (t + dt/3):  (D10 W^n + D11 W1 + D12 W2)/dt + N(W1) = 0
    stage 2 (t + dt):    (D20 W^n + D21 W1 + D22 W2)/dt + N(W2) = 0

with D10=-2, D11=3/2, D12=1/2, D20=2, D21=-9/2, D22=5/2 (reference
DAIrkPimpleFoam.C:42-50) — third-order accurate and L-stable. The two
stages are solved with Gauss-Seidel sweeps of SIMPLE-style stage solves
(momentum predictor + pressure corrections + SA transport), mirroring the
reference's U1EqnIrkPimple.H / p1EqnIrkPimple.H / nuTilda1EqnIrkPimple.H
sweep structure.

TPU-native design: the stage-1 fields are REGISTERED ADJOINT STATES
(U1/p1/phi1/nuTilda1) next to the end-of-step fields, so one per-step
residual vector contains both collocation rows and the generic reverse-scan
unsteady adjoint (dafoam_tpu.adjoint.unsteady) linearizes the whole coupled
IRK system exactly — the reference hand-codes the coupled stage adjoint
instead (calcResiduals with U1Res/U2Res rows, DAIrkPimpleFoam.C:89-92).
Only W^n enters each step's residual (ddt_order=1), so checkpointed
reverse sweeps work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.pimple import DAPimpleFoam
from dafoam_tpu.states import StateInfo, StateLayout


class DAIrkPimpleFoam(DAPimpleFoam):

    # Radau IIA(2,3) differentiation-matrix rows (c = (1/3, 1))
    D1 = (-2.0, 1.5, 0.5)
    D2 = (2.0, -4.5, 2.5)

    def __init__(self, option, topo, points):
        super().__init__(option, topo, points)
        if self.has_T:
            raise NotImplementedError("DAIrkPimpleFoam: passive T transport "
                                      "is not supported (match reference)")
        si = self.state_info
        self._base_states = ("U", "p", "phi") + tuple(si.model)
        self.state_info = StateInfo(
            vol_vector=("U", "U1"),
            vol_scalar=("p", "p1"),
            model=si.model + tuple(k + "1" for k in si.model),
            surface_scalar=("phi", "phi1"))
        self.layout = StateLayout(self.state_info, topo.n_cells,
                                  topo.n_faces)
        irk = self.option.get("irk", {}) or {}
        self.max_sweeps = int(irk.get("maxSweeps", 4))
        self.relax_ueqn = float(irk.get("relaxUEqn", 1.0))
        # IRK collocation: each step depends on W^n only
        self.ddt_scheme, self.ddt_order = "IRK", 1

    # ------------------------------------------------------------------
    # stage helpers
    # ------------------------------------------------------------------
    def _stage_view(self, W, s):
        suf = "1" if s == 1 else ""
        return {k: W[k + suf] for k in self._base_states}

    def _stage_coeffs(self, s):
        d0, d1, d2 = self.D1 if s == 1 else self.D2
        dkk = d1 if s == 1 else d2      # own-stage coefficient
        doth = d2 if s == 1 else d1     # other-stage coefficient
        return d0, dkk, doth

    def _irk_ddt_matrix(self, psi, dkk, rate, geom):
        """FvMatrix of the collocation ddt: diag dkk/dt*V, source -rate*V,
        so its residual contribution is (dkk*psi/dt + rate) per volume."""
        v = geom.vol if psi.ndim == 1 else geom.vol[:, None]
        ni = self.topo.n_internal
        return fvx.FvMatrix(
            diag=jnp.zeros_like(psi) + dkk / self.dt * v,
            lower=jnp.zeros((ni,), psi.dtype),
            upper=jnp.zeros((ni,), psi.dtype),
            source=jnp.zeros_like(psi) - rate * v)

    def _stage_ueqn(self, Wst, dkk, rate_U, inputs, geom):
        U, phi = Wst["U"], Wst["phi"]
        U_bco = self._bco_U(U, inputs, geom, phi)
        M = fvm.div(geom, self.topo, phi, U, U_bco,
                    scheme=self.div_u_scheme) \
            + self.turb.divdevreff(U, Wst, inputs, geom, U_bco) \
            + self._irk_ddt_matrix(U, dkk, rate_U, geom)
        return M, U_bco

    # ------------------------------------------------------------------
    # residuals: both collocation rows in one vector
    # ------------------------------------------------------------------
    def residuals_unsteady(self, W, W_old, W_oldold, inputs, n=None):
        if n is not None:
            # physical time of step n (time-dependent BC parity with the
            # primal scan, solvers/pimple.py residuals_unsteady)
            inputs = {**inputs,
                      "t": jnp.asarray(n, self.dtype) * self.dt}
        geom = self.geometry(inputs)
        topo = self.topo
        views = {1: self._stage_view(W, 1), 2: self._stage_view(W, 2)}
        out = {}
        for s in (1, 2):
            suf = "1" if s == 1 else ""
            d0, dkk, doth = self._stage_coeffs(s)
            Wst, Woth = views[s], views[2 if s == 1 else 1]

            def rate(k, d0=d0, doth=doth, Woth=Woth):
                return (d0 * W_old[k] + doth * Woth[k]) / self.dt

            U, p, phi = Wst["U"], Wst["p"], Wst["phi"]
            UEqn, U_bco = self._stage_ueqn(Wst, dkk, rate("U"), inputs,
                                           geom)
            p_bco0 = self._bco_p(p, inputs, geom, phi)
            p_b = bc.boundary_value(p_bco0, p, topo)
            gradp = fvc.grad(geom, topo, p, p_b)
            out["U" + suf] = fvx.residual(UEqn, U, geom, topo) + gradp
            rAU, rAU_f, HbyA, phiHbyA, pM, p_bco = self._projection(
                Wst, inputs, geom, UEqn, U_bco, U)
            out["p" + suf] = fvx.residual(pM, p, geom, topo)
            p_flux = fvm.laplacian_flux(geom, topo, rAU_f, p, p_bco)
            out["phi" + suf] = phiHbyA - p_flux - phi
            if self.turb.model_states:
                U_b = bc.boundary_value(U_bco, U, topo)
                gradU = fvc.grad(geom, topo, U, U_b)
                res_t = self.turb.residuals(Wst, inputs, geom, phi,
                                            gradU=gradU)
                for k in self.turb.model_states:
                    out[k + suf] = res_t[k] + dkk * Wst[k] / self.dt \
                        + rate(k)
        return self._apply_res_norm(out, geom)

    # stage rows inherit the base row's normalization semantics
    def _apply_res_norm(self, res, geom):
        base = {k: v for k, v in res.items() if not k.endswith("1")}
        stage = {k[:-1]: v for k, v in res.items() if k.endswith("1")}
        out = dict(super()._apply_res_norm(base, geom))
        for k, v in super()._apply_res_norm(stage, geom).items():
            out[k + "1"] = v
        return out

    def state_scales(self, geom):
        out = super().state_scales(geom)
        ns = self.option["normalizeStates"]
        for k in list(out):
            if k.endswith("1") and k[:-1] in out and k not in ns:
                out[k] = out[k[:-1]]
        return out

    def init_state(self):
        st = super().init_state()
        for k in self._base_states:
            st[k + "1"] = st[k]
        return st

    # ------------------------------------------------------------------
    # primal: Gauss-Seidel sweeps of SIMPLE-style stage solves
    # ------------------------------------------------------------------
    def _stage_solve(self, s, st, state_old, inputs, geom, lin):
        suf = "1" if s == 1 else ""
        oth = "" if s == 1 else "1"
        d0, dkk, doth = self._stage_coeffs(s)
        Wst = self._stage_view(st, s)

        def rate(k):
            return (d0 * state_old[k] + doth * st[k + oth]) / self.dt

        M, U_bco = self._stage_ueqn(Wst, dkk, rate("U"), inputs, geom)
        M = fvx.relax(M, Wst["U"], self.relax_ueqn, self.topo)
        p_bco = self._bco_p(Wst["p"], inputs, geom, Wst["phi"])
        p_b = bc.boundary_value(p_bco, Wst["p"], self.topo)
        gradp = fvc.grad(geom, self.topo, Wst["p"], p_b)
        rhs_U = -gradp * geom.vol[:, None]
        U_pred, _ = fvsolve.solve(M, Wst["U"], self.topo, symmetric=False,
                                  rel_tol=lin["uRelTol"],
                                  max_iters=lin["uMaxIters"], rhs=rhs_U)
        Wst = dict(Wst, U=U_pred)

        def corr(_, Wc):
            rAU, rAU_f, HbyA, phiHbyA, pM, p_bco2 = self._projection(
                Wc, inputs, geom, M, U_bco, Wc["U"])
            p_new, _ = fvsolve.solve(pM, Wc["p"], self.topo,
                                     symmetric=True,
                                     rel_tol=lin["pRelTol"],
                                     max_iters=lin["pMaxIters"])
            phi_new = phiHbyA - fvm.laplacian_flux(
                geom, self.topo, rAU_f, p_new, p_bco2)
            pb2 = self._bco_p(p_new, inputs, geom, phi_new)
            p_b2 = bc.boundary_value(pb2, p_new, self.topo)
            gradp2 = fvc.grad(geom, self.topo, p_new, p_b2)
            U_new = HbyA - rAU[:, None] * gradp2
            return dict(Wc, U=U_new, p=p_new, phi=phi_new)

        Wst = jax.lax.fori_loop(0, self.n_corr, corr, Wst)

        if self.turb.model_states:
            U_bco2 = self._bco_U(Wst["U"], inputs, geom, Wst["phi"])
            U_b = bc.boundary_value(U_bco2, Wst["U"], self.topo)
            gradU = fvc.grad(geom, self.topo, Wst["U"], U_b)
            # collocation ddt as an equivalent Euler step:
            # dkk/dt (psi - (-rate*dt/dkk)) == (dkk psi/dt + rate)
            dt_eff = self.dt / dkk
            old_eff = {k: -rate(k) * dt_eff for k in self.turb.model_states}
            Wst = self.turb.correct(Wst, inputs, geom, Wst["phi"],
                                    gradU=gradU, rel_tol=lin["turbRelTol"],
                                    max_iters=lin["turbMaxIters"],
                                    relax=1.0, dt=dt_eff, old=old_eff)
        return {**st, **{k + suf: Wst[k] for k in self._base_states}}

    def _step(self, state_old, inputs, geom, state_oldold=None, t=None):
        if t is not None:
            # physical time for time-dependent (DAMisc parametric) BCs
            inputs = {**inputs, "t": t}
        lin = self.option["primalLinearSolver"]

        def sweep(_, st):
            st = self._stage_solve(1, st, state_old, inputs, geom, lin)
            st = self._stage_solve(2, st, state_old, inputs, geom, lin)
            return st

        return jax.lax.fori_loop(0, self.max_sweeps, sweep, state_old)

    # ------------------------------------------------------------------
    # unsteady adjoint PC: per-equation operators for both stages
    # ------------------------------------------------------------------
    def unsteady_pc_assemble(self, W, W1, W2, inputs):
        geom = self.geometry(inputs)
        zero = jnp.zeros((), self.dtype)
        mats = {}
        for s in (1, 2):
            suf = "1" if s == 1 else ""
            _, dkk, _ = self._stage_coeffs(s)
            Wst = self._stage_view(W, s)
            UEqn, U_bco = self._stage_ueqn(
                Wst, dkk, zero * Wst["U"], inputs, geom)
            _, _, _, _, pM, _ = self._projection(Wst, inputs, geom, UEqn,
                                                 U_bco, Wst["U"])
            mats["U" + suf] = UEqn
            mats["p" + suf] = pM
            if self.turb.model_states:
                U_b = bc.boundary_value(U_bco, Wst["U"], self.topo)
                gradU = fvc.grad(geom, self.topo, Wst["U"], U_b)
                for k, (m, _sym) in self.turb.pc_matrices(
                        Wst, inputs, geom, Wst["phi"], gradU).items():
                    mats[k + suf] = m + fvm.ddt(
                        geom, self.topo, Wst[k], Wst[k], self.dt / dkk)
        return mats

    def _unsteady_pc_apply_fn(self, inputs):
        from dafoam_tpu.adjoint.precond import build_pc

        geom = self.geometry(inputs)
        scales = self.state_scales(geom)
        opt = dict(self.option["adjEqnOption"])
        if opt.get("pcType") == "coupledLine":
            opt["pcType"] = "lineJacobi"   # no standing matT in the sweep

        def pc_apply(mats, r):
            matrices = {k: (m, k in ("p", "p1")) for k, m in mats.items()}
            pc = build_pc(matrices, self.topo, geom, scales, opt,
                          identity_fields=("phi", "phi1"))
            if getattr(pc, "needs_opT", False):
                pc = pc(None)   # sweeps==1: the operator is never used
            return pc(r)

        return pc_apply
