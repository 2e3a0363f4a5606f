"""Two-phase VoF solver (interFoam) with a differentiable MULES limiter.

Capability parity with the reference's DAInterFoam
(src/adjoint/DASolver/DAInterFoam/: UEqnInter.H rho-weighted momentum with
buoyancy/pressure face reconstruction, pEqnInter.H p_rgh projection,
src/include/VoF/alphaEqn.H cAlpha interface compression) and its
differentiable MULES fork (src/adjoint/DAMisc/MULESDF/). TPU-native
structure:

- alpha transport is one EXPLICIT flux-corrected (Zalesak/MULES) update
  per time step: bounded upwind low-order flux + compression/high-order
  antidiffusive correction limited so alpha stays in [0, 1]; the limiter
  is face-sum/shift algebra — fully vectorized and differentiable
  (min/max subgradients);
- momentum: ddt(rho U) + div(rhoPhi, U) - laplacian(muEff, U) with the
  buoyancy + p_rgh force reconstructed from faces (fvc.reconstruct);
- pressure: laplacian(rAUf, p_rgh) == div(phiHbyA + phig), flux state
  R_phi = phiHbyA + phig - p_rghEqn.flux() - phi;
- the alpha residual row is EXPLICIT (alpha is updated from old-time
  values only): R_alpha = alpha - alphaUpdate(W_old), so the unsteady
  reverse sweep handles it through the cross-step vjp terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.ops.core import (cell_to_face_nei, cell_to_face_own,
                                 face_sum_signed, scatter_add, surface_sum)
from dafoam_tpu.solvers.base import PrimalInfo
from dafoam_tpu.solvers.pimple import DAPimpleFoam
from dafoam_tpu.states import StateInfo


class DAInterFoam(DAPimpleFoam):

    def __init__(self, option, topo, points):
        from dafoam_tpu.option import DAOption
        opt = option if isinstance(option, DAOption) else DAOption(option)
        # bypass DAPimpleFoam/DASimpleFoam state setup: define our own
        self.has_T = False
        self.state_info = StateInfo(vol_vector=("U",),
                                    vol_scalar=("p_rgh", "alpha"),
                                    model=(),
                                    surface_scalar=("phi",))
        # grandparent init (DASolverBase) via the SimpleFoam ctor would
        # re-set state_info; replicate the needed pieces directly
        from dafoam_tpu.solvers.base import DASolverBase
        DASolverBase.__init__(self, opt, topo, points)
        from dafoam_tpu.models import make_turbulence_model
        self.turb = make_turbulence_model("None", topo, self.option)
        self.div_u_scheme = self.option["divSchemes"].get(
            "div(rhoPhi,U)", "upwind")
        tp = self.option["transportProperties"]
        self.rho1 = float(tp.get("rho1", 1000.0))
        self.rho2 = float(tp.get("rho2", 1.0))
        self.nu1 = float(tp.get("nu1", 1e-6))
        self.nu2 = float(tp.get("nu2", 1.48e-5))
        self.c_alpha = float(tp.get("cAlpha", 1.0))
        self.g = np.asarray(self.option.get("g", [0.0, -9.81, 0.0]))
        self.dt = float(self.option["deltaT"])
        self.n_steps = int(round(float(self.option["endTime"]) / self.dt))
        pcfg = self.option.get("pimple", {}) or {}
        self.n_outer = pcfg.get("nOuterCorrectors", 3)
        self.n_corr = pcfg.get("nCorrectors", 2)
        self.ddt_scheme, self.ddt_order = "Euler", 1
        pspec = self.bc_spec.get("p_rgh", {})
        self.p_needs_ref = not any(
            s["type"] in ("fixedValue",) for s in pspec.values())
        ni = topo.n_internal
        fixed = np.zeros((topo.n_faces - ni,))
        for p in topo.patches:
            s = self.bc_spec.get("U", {}).get(p.name,
                                              {"type": "zeroGradient"})
            if s["type"] in ("fixedValue", "noSlip", "empty") \
                    or p.kind == "empty":
                fixed[p.start - ni:p.start - ni + p.size] = 1.0
        self._fixed_flux_b = jnp.asarray(fixed, self.dtype)
        self._user_bounds = {}

    # -- mixture (differentiable via inputs params) -----------------------
    def _mixture(self, alpha, inputs):
        p = inputs["params"]
        rho1 = p.get("rho1", self.rho1)
        rho2 = p.get("rho2", self.rho2)
        nu1 = p.get("nu1", self.nu1)
        nu2 = p.get("nu2", self.nu2)
        a = jnp.clip(alpha, 0.0, 1.0)
        rho = a * rho1 + (1.0 - a) * rho2
        mu = a * rho1 * nu1 + (1.0 - a) * rho2 * nu2
        return rho, mu

    def _bco_a(self, alpha, inputs, geom, phi):
        return bc.coeffs(self.bc_spec.get("alpha", {}),
                         inputs["bc"].get("alpha", {}), self.topo, geom,
                         alpha, rank=0, phi_b=phi[self.topo.n_internal:])

    def _bco_p(self, p, inputs, geom, phi):
        return bc.coeffs(self.bc_spec["p_rgh"],
                         inputs["bc"].get("p_rgh", {}), self.topo, geom, p,
                         rank=0, phi_b=phi[self.topo.n_internal:])

    # -- MULES alpha update (explicit, flux-corrected) --------------------
    def alpha_update(self, alpha_old, phi, U, inputs, geom):
        """One Euler FCT step: bounded upwind + limited antidiffusion
        (compression + central correction) — the MULESDF analog."""
        topo = self.topo
        ni = topo.n_internal
        dt = self.dt
        a_bco = self._bco_a(alpha_old, inputs, geom, phi)
        a_b = bc.boundary_value(a_bco, alpha_old, topo)
        a_own = cell_to_face_own(alpha_old, topo)
        a_nei = cell_to_face_nei(alpha_old, topo)
        phi_i = phi[:ni]
        pos = (phi_i >= 0.0).astype(self.dtype)

        # low-order (bounded upwind) face flux
        F_low = phi_i * (pos * a_own + (1.0 - pos) * a_nei)

        # high-order: central + interface compression
        w = geom.weights[:ni]
        a_cen = w * a_own + (1.0 - w) * a_nei
        grad_a = fvc.grad(geom, topo, alpha_old, a_b)
        g_f = fvc.interpolate(geom, topo, grad_a,
                              grad_a[topo.owner[ni:]])[:ni]
        gmag = jnp.sqrt(jnp.maximum(jnp.sum(g_f * g_f, -1), 1e-16))
        nhat = g_f / gmag[:, None]
        msf = jnp.where(geom.magsf[:ni] > 0.0, geom.magsf[:ni], 1.0)
        phic = self.c_alpha * jnp.abs(phi_i) / msf
        phir = phic * jnp.einsum("fi,fi->f", nhat, geom.sf[:ni])
        # alphar scheme on alpha(1-alpha): upwind w.r.t. phir
        ar_own = a_own * (1.0 - a_own)
        ar_nei = a_nei * (1.0 - a_nei)
        posr = (phir >= 0.0).astype(self.dtype)
        F_comp = phir * (posr * ar_own + (1.0 - posr) * ar_nei)
        F_high = phi_i * a_cen + F_comp
        A = F_high - F_low                     # antidiffusive face flux

        vol_dt = geom.vol / dt
        # boundary flux (outflow takes owner alpha, inflow takes BC value)
        phi_b = phi[ni:]
        pos_b = (phi_b >= 0.0).astype(self.dtype)
        a_own_b = alpha_old[topo.owner[ni:]]
        F_b = phi_b * (pos_b * a_own_b + (1.0 - pos_b) * a_b)

        div_low = surface_sum(F_low, F_b, topo) / geom.vol
        a_low = alpha_old - dt * div_low

        # Zalesak limiter with global bounds [0, 1] (MULES alphaMax/Min)
        # sign convention: a face flux A increases the NEIGHBOUR when A>0
        # and the OWNER when A<0
        from dafoam_tpu.ops.core import face_sum_pair
        P_plus = face_sum_pair(jnp.maximum(-A, 0.0), jnp.maximum(A, 0.0),
                               topo)
        P_minus = face_sum_pair(jnp.maximum(A, 0.0), jnp.maximum(-A, 0.0),
                                topo)
        Q_plus = jnp.maximum(1.0 - a_low, 0.0) * vol_dt
        Q_minus = jnp.maximum(a_low - 0.0, 0.0) * vol_dt
        R_plus = jnp.minimum(1.0, Q_plus / jnp.maximum(P_plus, 1e-30))
        R_minus = jnp.minimum(1.0, Q_minus / jnp.maximum(P_minus, 1e-30))
        Rp_own = cell_to_face_own(R_plus, topo)
        Rp_nei = cell_to_face_nei(R_plus, topo)
        Rm_own = cell_to_face_own(R_minus, topo)
        Rm_nei = cell_to_face_nei(R_minus, topo)
        # A>0: owner loses (R_minus[own]), neighbour gains (R_plus[nei])
        lam = jnp.where(A >= 0.0, jnp.minimum(Rm_own, Rp_nei),
                        jnp.minimum(Rp_own, Rm_nei))
        F_lim = F_low + lam * A
        alpha_new = alpha_old - dt * surface_sum(F_lim, F_b, topo) / geom.vol
        alpha_phi = jnp.concatenate([F_lim, F_b])
        return alpha_new, alpha_phi

    # -- one time step ------------------------------------------------------
    def _step(self, state_old, inputs, geom, state_oldold=None, t=None):
        if t is not None:
            # physical time for time-dependent (DAMisc parametric) BCs
            inputs = {**inputs, "t": t}
        lin = self.option["primalLinearSolver"]
        topo = self.topo
        ni = topo.n_internal
        dt = self.dt
        gh = jnp.asarray(self.g, self.dtype) @ geom.cc.T       # (nc,)
        ghf = jnp.asarray(self.g, self.dtype) @ geom.cf.T      # (nf,)

        alpha_new, alpha_phi = self.alpha_update(
            state_old["alpha"], state_old["phi"], state_old["U"], inputs,
            geom)
        rho, mu = self._mixture(alpha_new, inputs)
        rho_old, _ = self._mixture(state_old["alpha"], inputs)
        rho_b = rho[topo.owner[ni:]]
        rho_f = fvc.interpolate(geom, topo, rho, rho_b)
        mu_f = fvc.interpolate(geom, topo, mu, mu[topo.owner[ni:]])
        rho_phi = self.rho2 * state_old["phi"] \
            + (self.rho1 - self.rho2) * alpha_phi

        def outer(_, state):
            U, p, phi = state["U"], state["p_rgh"], state["phi"]
            U_bco = self._bco_U(U, inputs, geom, phi)
            M = fvm.div(geom, topo, rho_phi, U, U_bco,
                        scheme=self.div_u_scheme) \
                - fvm.laplacian(geom, topo, mu_f, U,
                                U_bco)
            v = geom.vol[:, None]
            M = M + fvx.FvMatrix(
                diag=jnp.broadcast_to(rho[:, None] * v / dt, U.shape),
                lower=jnp.zeros((ni,), self.dtype),
                upper=jnp.zeros((ni,), self.dtype),
                source=rho_old[:, None] * v / dt * state_old["U"])

            rAU = 1.0 / fvx.A(M, geom)
            # predictor skipped (PISO-style); go straight to projection
            HbyA = rAU[:, None] * fvx.H(M, U, geom, topo)
            U_b = bc.boundary_value(U_bco, U, topo)
            HbyA_b = jnp.where(self._fixed_flux_b[:, None] > 0.5, U_b,
                               HbyA[topo.owner[ni:]])
            phiHbyA = fvc.flux(geom, topo, HbyA, HbyA_b)
            rAU_f = fvc.interpolate(geom, topo, rAU,
                                    rAU[topo.owner[ni:]])
            # buoyancy face flux phig = -ghf snGrad(rho) rAUf |Sf|
            sng_rho = jnp.concatenate(
                [(cell_to_face_nei(rho, topo) - cell_to_face_own(rho, topo))
                 * geom.nonorth_dc[:ni], jnp.zeros((topo.n_boundary,),
                                                   self.dtype)])
            phig = -ghf * sng_rho * rAU_f * geom.magsf

            p_bco = self._bco_p(p, inputs, geom, phi)
            pM = fvm.laplacian(geom, topo, rAU_f, p, p_bco)
            pM = pM.add_source(
                fvc.div_surface(geom, topo, phiHbyA + phig) * geom.vol)
            if self.p_needs_ref:
                pM = fvx.set_reference(pM, 0, 0.0)

            def corr(_, st):
                p_new, _ = fvsolve.solve(pM, st["p_rgh"], topo,
                                         symmetric=True,
                                         rel_tol=lin["pRelTol"],
                                         max_iters=lin["pMaxIters"])
                p_bco2 = self._bco_p(p_new, inputs, geom, st["phi"])
                pflux = fvm.laplacian_flux(geom, topo, rAU_f, p_new,
                                           p_bco2)
                phi_new = phiHbyA + phig - pflux
                # U = HbyA + rAU * reconstruct((phig - pflux)/rAUf)
                # (reference pEqnInter.H:64)
                U_new = HbyA + rAU[:, None] * fvc.reconstruct(
                    geom, topo, (phig - pflux) / jnp.where(
                        rAU_f > 0.0, rAU_f, 1.0))
                return dict(st, U=U_new, p_rgh=p_new, phi=phi_new)

            st = jax.lax.fori_loop(0, self.n_corr, corr, dict(state))
            return dict(st, alpha=alpha_new)

        return jax.lax.fori_loop(0, self.n_outer, outer,
                                 dict(state_old, alpha=alpha_new))

    # -- residual -----------------------------------------------------------
    def residuals_unsteady(self, W, W_old, W_oldold, inputs, n=None):
        if n is not None:
            # physical time of step n (time-dependent BC parity with the
            # primal scan, solvers/pimple.py residuals_unsteady)
            inputs = {**inputs,
                      "t": jnp.asarray(n, self.dtype) * self.dt}
        geom = self.geometry(inputs)
        topo = self.topo
        ni = topo.n_internal
        dt = self.dt
        ghf = jnp.asarray(self.g, self.dtype) @ geom.cf.T
        U, p, phi, alpha = W["U"], W["p_rgh"], W["phi"], W["alpha"]

        alpha_pred, alpha_phi = self.alpha_update(
            W_old["alpha"], W_old["phi"], W_old["U"], inputs, geom)
        r_alpha = alpha - alpha_pred

        rho, mu = self._mixture(alpha, inputs)
        rho_old, _ = self._mixture(W_old["alpha"], inputs)
        rho_f = fvc.interpolate(geom, topo, rho, rho[topo.owner[ni:]])
        mu_f = fvc.interpolate(geom, topo, mu, mu[topo.owner[ni:]])
        rho_phi = self.rho2 * W_old["phi"] \
            + (self.rho1 - self.rho2) * alpha_phi

        U_bco = self._bco_U(U, inputs, geom, phi)
        M = fvm.div(geom, topo, rho_phi, U, U_bco,
                    scheme=self.div_u_scheme) \
            - fvm.laplacian(geom, topo, mu_f, U, U_bco)
        v = geom.vol[:, None]
        M = M + fvx.FvMatrix(
            diag=jnp.broadcast_to(rho[:, None] * v / dt, U.shape),
            lower=jnp.zeros((ni,), self.dtype),
            upper=jnp.zeros((ni,), self.dtype),
            source=rho_old[:, None] * v / dt * W_old["U"])
        # body force: buoyancy + p_rgh gradient, face-reconstructed
        sng_rho = jnp.concatenate(
            [(cell_to_face_nei(rho, topo) - cell_to_face_own(rho, topo))
             * geom.nonorth_dc[:ni],
             jnp.zeros((topo.n_boundary,), self.dtype)])
        p_bco = self._bco_p(p, inputs, geom, phi)
        sng_p = jnp.concatenate(
            [(cell_to_face_nei(p, topo) - cell_to_face_own(p, topo))
             * geom.nonorth_dc[:ni],
             bc.boundary_sngrad(p_bco, p, topo)])
        force = fvc.reconstruct(
            geom, topo, (-ghf * sng_rho - sng_p) * geom.magsf)
        r_U = fvx.residual(M, U, geom, topo) - force

        rAU = 1.0 / fvx.A(M, geom)
        HbyA = rAU[:, None] * fvx.H(M, U, geom, topo)
        U_b = bc.boundary_value(U_bco, U, topo)
        HbyA_b = jnp.where(self._fixed_flux_b[:, None] > 0.5, U_b,
                           HbyA[topo.owner[ni:]])
        phiHbyA = fvc.flux(geom, topo, HbyA, HbyA_b)
        rAU_f = fvc.interpolate(geom, topo, rAU, rAU[topo.owner[ni:]])
        phig = -ghf * sng_rho * rAU_f * geom.magsf
        pM = fvm.laplacian(geom, topo, rAU_f, p, p_bco)
        pM = pM.add_source(
            fvc.div_surface(geom, topo, phiHbyA + phig) * geom.vol)
        if self.p_needs_ref:
            pM = fvx.set_reference(pM, 0, 0.0)
        r_p = fvx.residual(pM, p, geom, topo)
        pflux = fvm.laplacian_flux(geom, topo, rAU_f, p, p_bco)
        r_phi = phiHbyA + phig - pflux - phi
        out = {"U": r_U, "p_rgh": r_p, "phi": r_phi, "alpha": r_alpha}
        return self._apply_res_norm(out, geom)

    def boundary_fields(self, state, inputs, geom):
        topo = self.topo
        U_bco = self._bco_U(state["U"], inputs, geom, state["phi"])
        a_bco = self._bco_a(state["alpha"], inputs, geom, state["phi"])
        p_bco = self._bco_p(state["p_rgh"], inputs, geom, state["phi"])
        return {"U": bc.boundary_value(U_bco, state["U"], topo),
                "alpha": bc.boundary_value(a_bco, state["alpha"], topo),
                "p_rgh": bc.boundary_value(p_bco, state["p_rgh"], topo)}

    # -- unsteady adjoint PC: two-phase operators --------------------------
    def unsteady_pc_assemble(self, W, W1, W2, inputs):
        """Segregated PC matrices for the VoF adjoint (overrides the
        single-phase pimple version): rho-weighted momentum + p_rgh
        laplacian; alpha rows are identity (explicit update)."""
        geom = self.geometry(inputs)
        topo = self.topo
        ni = topo.n_internal
        alpha_pred, alpha_phi = self.alpha_update(
            W1["alpha"], W1["phi"], W1["U"], inputs, geom)
        rho, mu = self._mixture(W["alpha"], inputs)
        mu_f = fvc.interpolate(geom, topo, mu, mu[topo.owner[ni:]])
        rho_phi = self.rho2 * W1["phi"] \
            + (self.rho1 - self.rho2) * alpha_phi
        U_bco = self._bco_U(W["U"], inputs, geom, W["phi"])
        M = fvm.div(geom, topo, rho_phi, W["U"], U_bco, scheme="upwind") \
            - fvm.laplacian(geom, topo, mu_f, W["U"], U_bco)
        v = geom.vol[:, None]
        M = M + fvx.FvMatrix(
            diag=jnp.broadcast_to(rho[:, None] * v / self.dt,
                                  W["U"].shape),
            lower=jnp.zeros((ni,), self.dtype),
            upper=jnp.zeros((ni,), self.dtype),
            source=jnp.zeros_like(W["U"]))
        rAU = 1.0 / fvx.A(M, geom)
        rAU_f = fvc.interpolate(geom, topo, rAU, rAU[topo.owner[ni:]])
        p_bco = self._bco_p(W["p_rgh"], inputs, geom, W["phi"])
        pM = fvm.laplacian(geom, topo, rAU_f, W["p_rgh"], p_bco)
        if self.p_needs_ref:
            pM = fvx.set_reference(pM, 0, 0.0)
        return {"U": M, "p_rgh": pM}
