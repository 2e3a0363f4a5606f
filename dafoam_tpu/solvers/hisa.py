"""Density-based compressible flow solver — the DAHisaFoam role.

The reference's DAHisaFoam (src/adjoint/DASolver/DAHisaFoam/DAHisaFoam.C)
wraps the external HiSA library for the primal (AUSM-family flux,
JT-KIRK implicit pseudo-time) and defines its OWN adjoint-side residual in
DAResidualHisaFoam.C with two self-contained flux schemes:

    calcFluxLaxFriedrichs (DAResidualHisaFoam.C:118) — central + Rusanov
        scalar dissipation, used for the preconditioner (hisaPCFlux);
    calcFluxJST (DAResidualHisaFoam.C:137) — central + JST eps2/eps4
        pressure-sensor dissipation (hisaForceJSTFlux, jst_k2/jst_k4).

The residual (DAResidualHisaFoam.C:59-106):

    R_p = -div(phi);  R_U = -div(phiUp);  R_T = -div(phiEp)
    + viscous terms when not inviscid: laplacian(muEff, U) + div(tauMC),
      div(sigmaDotU) and laplacian(alphaEff, e) in the energy equation,

with conservative variables derived from the primitive states (U, p, T)
via perfect-gas thermo (updateIntermediateVariables, :186):
rho = psi p, psi = 1/(R T), e = Cv T, rhoE = rho (e + |U|^2/2).

TPU-native design: the same residual as pure JAX over states (U, p, T)
[+ turbulence model states], and the primal as matrix-free Newton
pseudo-transient continuation — (diag(1/dtau) + dR/dW) dW = -R with
jax.linearize providing the exact Jacobian action and FGMRES solving the
correction (the JT-KIRK role, hardware-friendly: one jitted while_loop,
no external library). Local dtau from the spectral radius with an SER
CFL ramp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.utils.precision import guard_tiny
import numpy as np

from dafoam_tpu.linalg.krylov import gmres
from dafoam_tpu.mesh.geometry import compute_geometry
from dafoam_tpu.mesh.walldist import compute_wall_distance
from dafoam_tpu.models import make_turbulence_model, _TURB_REGISTRY
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops.core import (boundary_gather, cell_to_face_nei,
                                 cell_to_face_own, face_sum_pair,
                                 face_sum_signed, surface_sum)
from dafoam_tpu.solvers.base import DASolverBase, PrimalInfo
from dafoam_tpu.states import StateInfo


class DAHisaFoam(DASolverBase):

    def __init__(self, option, topo, points):
        from dafoam_tpu.option import DAOption
        opt = option if isinstance(option, DAOption) else DAOption(option)
        turb_name = opt["turbulenceModel"]
        model_states = _TURB_REGISTRY[turb_name].model_states
        self.state_info = StateInfo(vol_vector=("U",),
                                    vol_scalar=("p", "T"),
                                    model=tuple(model_states))
        super().__init__(opt, topo, points)
        geom0 = compute_geometry(self.points, topo)
        self.wall_dist = jnp.asarray(
            compute_wall_distance(geom0, topo,
                                  points=np.asarray(points)), self.dtype)
        if turb_name in ("None", "laminar"):
            self.turb = make_turbulence_model(turb_name, topo, self.option,
                                              wall_dist=self.wall_dist)
        else:
            self.turb = make_turbulence_model(
                turb_name, topo, self.option, wall_dist=self.wall_dist,
                bc_spec=self.bc_spec)
        self.turb.setup_wall_functions(self.bc_spec)
        self._user_bounds = (option.get("primalVarBounds", {})
                             if isinstance(option, dict) else {})
        h = self.option.get("hisa", {})
        self.inviscid = bool(h.get("inviscid", False))
        self.flux_scheme = h.get("fluxScheme", "AUSMPlusUp")
        self.jst_k2 = float(h.get("jst_k2", 0.5))
        self.jst_k4 = float(h.get("jst_k4", 0.02))
        # open (inlet/outlet) boundary faces get a Rusanov characteristic
        # flux between the owner and BC states: pure BC-value fluxes have
        # zero dissipation there, leaving acoustic modes trapped between
        # reflective boundaries undamped (a primal limit cycle and a
        # near-singular Jacobian).  Wall-type faces keep the BC-value flux
        # (exact zero mass flux).  Classified statically from the U BC.
        closed = ("slip", "noSlip", "symmetry", "symmetryPlane", "empty",
                  "wall")
        uspec = self.bc_spec["U"]
        mask = np.zeros((topo.n_boundary,), dtype=np.float64)
        ni = topo.n_internal
        for p in topo.patches:
            btype = uspec.get(p.name, {"type": "zeroGradient"})["type"]
            if btype not in closed:
                mask[p.start - ni:p.start - ni + p.size] = 1.0
        self._open_b = jnp.asarray(mask, self.dtype)
        self._has_open = bool(mask.any())

    # -- thermo (perfect gas, e-based) ----------------------------------
    def _thermo(self, inputs):
        p = inputs["params"]
        R = p.get("R", 287.0)
        gamma = p.get("gamma", 1.4)
        Cv = R / (gamma - 1.0)
        return (R, gamma, Cv, p.get("mu", 1.8e-5), p.get("Pr", 0.7),
                p.get("Prt", 0.9))

    # -- BC helpers ------------------------------------------------------
    def _bcos(self, state, inputs, geom, phi_b=None):
        topo = self.topo
        if phi_b is None:
            phi_b = jnp.zeros((topo.n_boundary,), self.dtype)
        phi_full = jnp.concatenate(
            [jnp.zeros((topo.n_internal,), self.dtype), phi_b])
        out = {}
        for name, rank in (("U", 1), ("p", 0), ("T", 0)):
            out[name] = bc.coeffs(self.bc_spec[name],
                                  inputs["bc"].get(name, {}),
                                  topo, geom, state[name], rank=rank,
                                  phi_b=phi_b)
        return out

    # -- conservative variables + fluxes ---------------------------------
    def _cons(self, state, inputs, U_b, p_b, T_b):
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        p, T, U = state["p"], state["T"], state["U"]
        rho = p / (R * T)
        rhoU = rho[:, None] * U
        rhoE = rho * (Cv * T + 0.5 * jnp.sum(U * U, -1))
        rho_b = p_b / (R * T_b)
        rhoU_b = rho_b[:, None] * U_b
        rhoE_b = rho_b * (Cv * T_b + 0.5 * jnp.sum(U_b * U_b, -1))
        c = jnp.sqrt(gamma * R * T)
        c_b = jnp.sqrt(gamma * R * T_b)
        return rho, rhoU, rhoE, rho_b, rhoU_b, rhoE_b, c, c_b

    def _central_fluxes(self, geom, state, U_b, p_b, rho, rhoU, rhoE,
                        rho_b, rhoU_b, rhoE_b, c, c_b):
        """Central (linear-interpolated) convective fluxes on ALL faces.

        phi   = interp(rhoU) . Sf
        phiUp = interp(rhoU x U + p I) . Sf  (expanded per side so no
                (nf,3,3) tensor is materialized — TPU layout-friendly)
        phiEp = interp((rhoE + p) U) . Sf
        """
        topo = self.topo
        ni = topo.n_internal
        p, U = state["p"], state["U"]
        w = geom.weights[:ni]
        sf_i = geom.sf[:ni]

        def oi(x):
            return cell_to_face_own(x, topo)

        def nn(x):
            return cell_to_face_nei(x, topo)

        U_own, U_nei = oi(U), nn(U)
        uSf_own = jnp.einsum("fi,fi->f", U_own, sf_i)
        uSf_nei = jnp.einsum("fi,fi->f", U_nei, sf_i)
        rhoU_own, rhoU_nei = oi(rhoU), nn(rhoU)
        phi_i = jnp.einsum("fi,fi->f",
                           w[:, None] * rhoU_own
                           + (1 - w)[:, None] * rhoU_nei, sf_i)
        # (rhoU x U + p I) . Sf per side = rhoU (U.Sf) + p Sf
        p_own, p_nei = oi(p), nn(p)
        phiUp_i = (w[:, None] * (rhoU_own * uSf_own[:, None]
                                 + p_own[:, None] * sf_i)
                   + (1 - w)[:, None] * (rhoU_nei * uSf_nei[:, None]
                                         + p_nei[:, None] * sf_i))
        rEp_own = oi(rhoE) + p_own
        rEp_nei = nn(rhoE) + p_nei
        phiEp_i = w * rEp_own * uSf_own + (1 - w) * rEp_nei * uSf_nei

        phi_b, phiUp_b, phiEp_b = self._boundary_fluxes(
            geom, state, U_b, p_b, rho, rhoU, rhoE, rho_b, rhoU_b,
            rhoE_b, c, c_b)
        return (jnp.concatenate([phi_i, phi_b]),
                jnp.concatenate([phiUp_i, phiUp_b]),
                jnp.concatenate([phiEp_i, phiEp_b]))

    def _spec_radius_faces(self, geom, state, U_b, c, c_b):
        """|interp(U) . Sf|/|Sf| + interp(c) on internal faces (specR)."""
        topo = self.topo
        ni = topo.n_internal
        w = geom.weights[:ni]
        U = state["U"]
        Uf = (w[:, None] * cell_to_face_own(U, topo)
              + (1 - w)[:, None] * cell_to_face_nei(U, topo))
        msf = jnp.maximum(geom.magsf[:ni], 1e-36)
        un = jnp.abs(jnp.einsum("fi,fi->f", Uf, geom.sf[:ni])) / msf
        cf = w * cell_to_face_own(c, topo) + (1 - w) * cell_to_face_nei(
            c, topo)
        return cf + un

    def _ausm_fluxes(self, geom, state, inputs, U_b, p_b, T_b,
                     rho, rhoU, rhoE, rho_b, rhoU_b, rhoE_b, c, c_b):
        """AUSM+up interface flux (Liou 2006) on internal faces — the
        flux family HiSA's primal actually integrates (hisa fluxScheme
        AUSMPlusUp); differentiable (piecewise-polynomial splittings).
        Boundary faces keep the BC-value flux of _central_fluxes."""
        topo = self.topo
        ni = topo.n_internal
        msf = jnp.maximum(geom.magsf[:ni], 1e-36)
        nhat = geom.sf[:ni] / msf[:, None]

        def oi(x):
            return cell_to_face_own(x, topo)

        def nn(x):
            return cell_to_face_nei(x, topo)

        rhoL, rhoR = oi(rho), nn(rho)
        UL, UR = oi(state["U"]), nn(state["U"])
        pL, pR = oi(state["p"]), nn(state["p"])
        EL, ER = oi(rhoE), nn(rhoE)
        # zero-area (degenerate dense-layout) faces: neutral states
        valid = (geom.magsf[:ni] > 0.0)
        rhoL = jnp.where(valid, rhoL, 1.0)
        rhoR = jnp.where(valid, rhoR, 1.0)
        aL, aR = oi(c), nn(c)
        a2 = 0.5 * (aL + aR)
        a2 = jnp.where(valid, a2, 1.0)
        unL = jnp.einsum("fi,fi->f", UL, nhat)
        unR = jnp.einsum("fi,fi->f", UR, nhat)
        ML = unL / a2
        MR = unR / a2

        def M1(M, s):
            return 0.5 * (M + s * jnp.abs(M))

        def M4(M, s, beta=0.125):
            sub = s * 0.25 * (M + s) ** 2 + s * beta * (M * M - 1.0) ** 2
            return jnp.where(jnp.abs(M) >= 1.0, M1(M, s), sub)

        def P5(M, s, alpha=0.1875):
            sub = 0.25 * (M + s) ** 2 * (2.0 - s * M) \
                + s * alpha * M * (M * M - 1.0) ** 2
            sup = jnp.where(s * M > 0.0, 1.0, 0.0)
            return jnp.where(jnp.abs(M) >= 1.0, sup, sub)

        rho2 = 0.5 * (rhoL + rhoR)
        Kp, Ku, sigma = 0.25, 0.75, 1.0
        Mbar2 = 0.5 * (unL * unL + unR * unR) / (a2 * a2)
        Mp = -Kp * jnp.maximum(1.0 - sigma * Mbar2, 0.0) \
            * (pR - pL) / (rho2 * a2 * a2)
        M2 = M4(ML, 1.0) + M4(MR, -1.0) + Mp
        mdot = a2 * M2 * jnp.where(M2 > 0.0, rhoL, rhoR)

        pu = -Ku * P5(ML, 1.0) * P5(MR, -1.0) * (rhoL + rhoR) \
            * a2 * (unR - unL)
        p2 = P5(ML, 1.0) * pL + P5(MR, -1.0) * pR + pu

        up = jnp.where(M2 > 0.0, 1.0, 0.0)
        HL = (EL + pL) / rhoL
        HR = (ER + pR) / rhoR
        phi_i = mdot * msf * valid
        phiUp_i = (mdot[:, None] * jnp.where(up[:, None] > 0.5, UL, UR)
                   * msf[:, None] + p2[:, None] * geom.sf[:ni]) \
            * valid[:, None]
        phiEp_i = mdot * jnp.where(up > 0.5, HL, HR) * msf * valid

        phi_b, phiUp_b, phiEp_b = self._boundary_fluxes(
            geom, state, U_b, p_b, rho, rhoU, rhoE, rho_b, rhoU_b,
            rhoE_b, c, c_b)
        return (jnp.concatenate([phi_i, phi_b]),
                jnp.concatenate([phiUp_i, phiUp_b]),
                jnp.concatenate([phiEp_i, phiEp_b]))

    def _boundary_fluxes(self, geom, state, U_b, p_b, rho, rhoU, rhoE,
                         rho_b, rhoU_b, rhoE_b, c, c_b):
        """Boundary convective fluxes: BC-value flux on wall-type faces,
        Rusanov flux between the owner and BC states on open faces."""
        topo = self.topo
        ni = topo.n_internal
        sf_b = geom.sf[ni:]
        msf_b = jnp.maximum(geom.magsf[ni:], 1e-36)
        uSf_b = jnp.einsum("fi,fi->f", U_b, sf_b)
        phi_bc = jnp.einsum("fi,fi->f", rhoU_b, sf_b)
        phiUp_bc = rhoU_b * uSf_b[:, None] + p_b[:, None] * sf_b
        phiEp_bc = (rhoE_b + p_b) * uSf_b
        ob = self._open_b
        if not self._has_open:
            return phi_bc, phiUp_bc, phiEp_bc
        # owner-side flux through the same face
        rho_o = boundary_gather(rho, topo)
        rhoU_o = boundary_gather(rhoU, topo)
        rhoE_o = boundary_gather(rhoE, topo)
        U_o = boundary_gather(state["U"], topo)
        p_o = boundary_gather(state["p"], topo)
        c_o = boundary_gather(c, topo)
        uSf_o = jnp.einsum("fi,fi->f", U_o, sf_b)
        phi_o = jnp.einsum("fi,fi->f", rhoU_o, sf_b)
        phiUp_o = rhoU_o * uSf_o[:, None] + p_o[:, None] * sf_b
        phiEp_o = (rhoE_o + p_o) * uSf_o
        lam = jnp.maximum(jnp.abs(uSf_o) / msf_b + c_o,
                          jnp.abs(uSf_b) / msf_b + c_b) * msf_b
        phi_ru = 0.5 * (phi_o + phi_bc) - 0.5 * lam * (rho_b - rho_o)
        phiUp_ru = 0.5 * (phiUp_o + phiUp_bc) \
            - 0.5 * lam[:, None] * (rhoU_b - rhoU_o)
        phiEp_ru = 0.5 * (phiEp_o + phiEp_bc) - 0.5 * lam * (rhoE_b - rhoE_o)
        return (jnp.where(ob > 0.5, phi_ru, phi_bc),
                jnp.where(ob[:, None] > 0.5, phiUp_ru, phiUp_bc),
                jnp.where(ob > 0.5, phiEp_ru, phiEp_bc))

    def _fluxes(self, state, inputs, geom, bcos, scheme=None):
        """(phi, phiUp, phiEp) with the configured dissipation, plus the
        pieces needed downstream (boundary values, conservative vars)."""
        scheme = scheme or self.flux_scheme
        topo = self.topo
        ni = topo.n_internal
        act = bcos["p"].active
        U_b = bc.boundary_value(bcos["U"], state["U"], topo) \
            * act[:, None]
        # empty-plane faces carry zeroed BC values; guard the thermo
        # division and zero their fluxes through the active mask
        p_b = bc.boundary_value(bcos["p"], state["p"], topo) * act
        T_b = jnp.where(act > 0.5,
                        bc.boundary_value(bcos["T"], state["T"], topo), 1.0)
        rho, rhoU, rhoE, rho_b, rhoU_b, rhoE_b, c, c_b = self._cons(
            state, inputs, U_b, p_b, T_b)
        if scheme == "AUSMPlusUp":
            phi, phiUp, phiEp = self._ausm_fluxes(
                geom, state, inputs, U_b, p_b, T_b, rho, rhoU, rhoE,
                rho_b, rhoU_b, rhoE_b, c, c_b)
            return (phi, phiUp, phiEp, U_b, p_b, T_b, rho, rho_b, c)
        phi, phiUp, phiEp = self._central_fluxes(
            geom, state, U_b, p_b, rho, rhoU, rhoE, rho_b, rhoU_b, rhoE_b,
            c, c_b)
        specR = self._spec_radius_faces(geom, state, U_b, c, c_b)
        msf_i = geom.magsf[:ni]

        def d1(x):  # first difference across internal faces (nei - own)
            return cell_to_face_nei(x, topo) - cell_to_face_own(x, topo)

        if scheme == "laxFriedrichs":
            # DAResidualHisaFoam.C:118: flux -= 0.5*specR*(x_N - x_O)*|Sf|
            diss = 0.5 * specR * msf_i
            phi = phi.at[:ni].add(-diss * d1(rho))
            phiUp = phiUp.at[:ni].add(-diss[:, None] * d1(rhoU))
            phiEp = phiEp.at[:ni].add(-diss * d1(rhoE))
        else:  # JST (DAResidualHisaFoam.C:137)
            p_st = state["p"]
            w = geom.weights[:ni]
            p_sum = 2.0 * (w * cell_to_face_own(p_st, topo)
                           + (1 - w) * cell_to_face_nei(p_st, topo))
            sensor = jnp.abs(d1(p_st)) / (p_sum + 1e-16)
            sensor = jnp.clip(sensor, 0.0, 1.0)
            eps2 = self.jst_k2 * sensor
            eps4 = jnp.maximum(0.0, self.jst_k4 - eps2)

            # d3 = orthogonalSnGrad(d2)/dc^2 = (d2_N - d2_O)/dc
            # (DAResidualHisaFoam.C:176-181)
            inv_dc = 1.0 / jnp.maximum(geom.delta_coeffs[:ni], 1e-36)

            def jst_scalar(x):
                dx = d1(x)                                     # (ni,)
                d2 = surface_sum(dx * msf_i, None, topo) / geom.vol
                d3 = d1(d2) * inv_dc
                return (eps2 * dx - eps4 * d3) * msf_i * specR

            def jst_vector(x):
                dx = d1(x)                                     # (ni,3)
                d2 = surface_sum(dx * msf_i[:, None], None, topo) \
                    / geom.vol[:, None]
                d3 = d1(d2) * inv_dc[:, None]
                return (eps2[:, None] * dx - eps4[:, None] * d3) \
                    * (msf_i * specR)[:, None]

            phi = phi.at[:ni].add(-jst_scalar(rho))
            phiUp = phiUp.at[:ni].add(-jst_vector(rhoU))
            phiEp = phiEp.at[:ni].add(-jst_scalar(rhoE))
        return (phi, phiUp, phiEp, U_b, p_b, T_b, rho, rho_b, c)

    # -- residuals --------------------------------------------------------
    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        return self._residuals_geom(state, inputs, geom)

    def _residuals_geom(self, state, inputs, geom, scheme=None):
        topo = self.topo
        ni = topo.n_internal
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        bcos = self._bcos(state, inputs, geom)
        (phi, phiUp, phiEp, U_b, p_b, T_b, rho, rho_b, c) = self._fluxes(
            state, inputs, geom, bcos, scheme=scheme)

        r_p = -fvc.div_surface(geom, topo, phi)
        r_U = -fvc.div_surface(geom, topo, phiUp)
        r_T = -fvc.div_surface(geom, topo, phiEp)

        if not self.inviscid:
            U = state["U"]
            mut = rho * self.turb.nut(state, inputs, geom)
            mut_b = rho_b * self.turb.nut_boundary(state, inputs, geom)
            mu_eff = mu + mut
            mu_eff_b = mu + mut_b
            mu_eff_f = fvc.interpolate(geom, topo, mu_eff, mu_eff_b)
            gradU = fvc.grad(geom, topo, U, U_b)
            sngU_b = bc.boundary_sngrad(bcos["U"], U, topo)
            sngU = fvc.snGrad(geom, topo, U, sngU_b, corrected=True,
                              grad_psi=gradU,
                              grad_psi_b=boundary_gather(gradU, topo))
            # fvc::laplacian(muEff, U)
            visc_flux = mu_eff_f[:, None] * sngU * geom.magsf[:, None]
            r_U = r_U + surface_sum(visc_flux[:ni], visc_flux[ni:],
                                    topo) / geom.vol[:, None]
            # tauMC = muEff dev2(gradU^T), div added explicitly
            gt = jnp.swapaxes(gradU, -1, -2)
            tr = jnp.trace(gradU, axis1=-2, axis2=-1)
            eye = jnp.eye(3, dtype=U.dtype)
            tau = mu_eff[:, None, None] * (
                gt - (2.0 / 3.0) * tr[..., None, None] * eye)
            tau_b = boundary_gather(tau, topo)
            r_U = r_U + fvc.div_tensor(geom, topo, tau, tau_b)
            # sigmaDotU work term (DAResidualHisaFoam.C:96-103)
            tau_f = fvc.interpolate(geom, topo, tau, tau_b)
            nhat = geom.sf / jnp.maximum(geom.magsf, 1e-36)[:, None]
            sig = (fvc.interpolate(geom, topo, mu_eff, mu_eff_b)[:, None]
                   * sngU
                   + jnp.einsum("fi,fij->fj", nhat, tau_f))
            Uf = fvc.interpolate(geom, topo, U, U_b)
            sigU = jnp.einsum("fi,fi->f", sig, Uf) * geom.magsf
            r_T = r_T + surface_sum(sigU[:ni], sigU[ni:], topo) / geom.vol
            # laplacian(alphaEff, e) with e = Cv T (perfect gas)
            alpha_eff = mu / Pr + mut / Prt
            alpha_eff_b = mu / Pr + mut_b / Prt
            alpha_f = fvc.interpolate(geom, topo, alpha_eff, alpha_eff_b)
            sngT_b = bc.boundary_sngrad(bcos["T"], state["T"], topo)
            gradT = fvc.grad(geom, topo, state["T"], T_b)
            sngT = fvc.snGrad(geom, topo, state["T"], sngT_b,
                              corrected=True, grad_psi=gradT,
                              grad_psi_b=boundary_gather(gradT, topo))
            eflux = Cv * alpha_f * sngT * geom.magsf
            r_T = r_T + surface_sum(eflux[:ni], eflux[ni:], topo) / geom.vol

        out = {"U": r_U, "p": r_p, "T": r_T}
        if self.turb.model_states:
            # SA transport on the VOLUMETRIC flux (mut = rho nut)
            rho_f = fvc.interpolate(geom, topo, rho, rho_b)
            phi_vol = phi / jnp.maximum(rho_f, 1e-36)
            gradU_t = fvc.grad(geom, topo, state["U"], U_b)
            out.update(self.turb.residuals(state, inputs, geom, phi_vol,
                                           gradU=gradU_t))
        return out

    # -- primal: Newton pseudo-transient continuation ---------------------
    def _bound(self, name, v):
        b = self._user_bounds
        lo, hi = b.get(name + "Min"), b.get(name + "Max")
        if name == "p":
            lo = 10.0 if lo is None else lo
        if name == "T":
            lo = 10.0 if lo is None else lo
        if lo is None and hi is None:
            return v
        return jnp.clip(v, lo if lo is not None else -jnp.inf,
                        hi if hi is not None else jnp.inf)

    def _inv_dtau(self, state, inputs, geom, cfl):
        """1/dtau per cell: sum_f (|u.Sf| + c |Sf|) / (CFL * V)."""
        topo = self.topo
        ni = topo.n_internal
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        c = jnp.sqrt(gamma * R * jnp.maximum(state["T"], 1.0))
        U = state["U"]
        lam_i = (jnp.abs(jnp.einsum(
            "fi,fi->f",
            0.5 * (cell_to_face_own(U, topo) + cell_to_face_nei(U, topo)),
            geom.sf[:ni]))
            + 0.5 * (cell_to_face_own(c, topo)
                     + cell_to_face_nei(c, topo)) * geom.magsf[:ni])
        lam_sum = face_sum_pair(lam_i, lam_i, topo)
        own_lam_b = jnp.abs(jnp.einsum(
            "fi,fi->f", boundary_gather(U, topo), geom.sf[ni:])) \
            + boundary_gather(c, topo) * geom.magsf[ni:]
        from dafoam_tpu.ops.core import boundary_scatter_add
        lam_sum = boundary_scatter_add(lam_sum, own_lam_b, topo)
        return lam_sum / (cfl * geom.vol)

    @staticmethod
    def _euler_flux_jac(u, q2, H, s, gamma):
        """Batched inviscid flux Jacobian A = d(F(Q).S)/dQ, (n,5,5).

        Conservative ordering Q = (rho, rhoU_x, rhoU_y, rhoU_z, rhoE);
        s is the DIRECTED face-area vector (not normalized), so A already
        carries the |Sf| factor.  Standard perfect-gas formula."""
        gm1 = gamma - 1.0
        un = jnp.einsum("fi,fi->f", u, s)
        n = u.shape[0]
        A = jnp.zeros((n, 5, 5), u.dtype)
        # mass row
        A = A.at[:, 0, 1:4].set(s)
        # momentum rows
        A = A.at[:, 1:4, 0].set(0.5 * gm1 * q2[:, None] * s - u * un[:, None])
        A = A.at[:, 1:4, 1:4].set(
            jnp.einsum("fi,fj->fij", u, s)
            + un[:, None, None] * jnp.eye(3, dtype=u.dtype)
            - gm1 * jnp.einsum("fj,fi->fij", u, s))
        A = A.at[:, 1:4, 4].set(gm1 * s)
        # energy row
        A = A.at[:, 4, 0].set((0.5 * gm1 * q2 - H) * un)
        A = A.at[:, 4, 1:4].set(H[:, None] * s - gm1 * u * un[:, None])
        A = A.at[:, 4, 4].set(gamma * un)
        return A

    def _block_pc(self, state, inputs, geom, inv_dt, sweeps):
        """Coupled 5x5-block Rusanov-Jacobian preconditioner — the LU-SGS
        operator role in HiSA's JT-KIRK solver, TPU-batched as block-Jacobi
        sweeps (batched 5x5 einsum = MXU-friendly; no sequential sweep).

        Approximates (V/dtau I + d(div F)/dQ)^{-1} in conservative
        variables, with the first-order Rusanov flux
        F_f = 0.5(F_i + F_j).Sf - 0.5 lam (Q_j - Q_i):
          dF/dQ_i = 0.5 A_i + 0.5 lam I ; dF/dQ_j = 0.5 A_j - 0.5 lam I.
        The scalar per-equation PC misses the acoustic p-U-T coupling that
        dominates this system (measured: GMRES-240 stalls at rel 0.7 with
        it; the coupled solve converges) — hence full blocks.

        Returns pc_solve: (nc,5) integral-form residual -> (nc,5) Q-increment.
        """
        from dafoam_tpu.ops.core import boundary_scatter_add
        topo = self.topo
        ni = topo.n_internal
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        U, p, T = state["U"], state["p"], state["T"]
        c = jnp.sqrt(gamma * R * jnp.maximum(T, 1.0))
        q2 = jnp.sum(U * U, -1)
        H = Cv * T + 0.5 * q2 + R * T          # total enthalpy / mass
        sf_i = geom.sf[:ni]
        u_o, u_n = cell_to_face_own(U, topo), cell_to_face_nei(U, topo)
        q2_o, q2_n = cell_to_face_own(q2, topo), cell_to_face_nei(q2, topo)
        H_o, H_n = cell_to_face_own(H, topo), cell_to_face_nei(H, topo)
        A_own = self._euler_flux_jac(u_o, q2_o, H_o, sf_i, gamma)
        A_nei = self._euler_flux_jac(u_n, q2_n, H_n, sf_i, gamma)
        specR = self._spec_radius_faces(geom, state, None, c, None)
        lam_i = specR * geom.magsf[:ni]
        I5 = jnp.eye(5, dtype=U.dtype)
        P = 0.5 * A_own + 0.5 * lam_i[:, None, None] * I5   # dF/dQ_own
        N = 0.5 * A_nei - 0.5 * lam_i[:, None, None] * I5   # dF/dQ_nei
        # diag: own += P, nei += -N  (R = -div F; system = M/dtau - dR/dQ)
        diag = face_sum_pair(P.reshape(ni, 25), (-N).reshape(ni, 25),
                             topo).reshape(-1, 5, 5)
        # boundary faces: Rusanov-level owner coupling ~ 0.5 lam_b I
        U_ob = boundary_gather(U, topo)
        lam_b = 0.5 * (jnp.abs(jnp.einsum("fi,fi->f", U_ob, geom.sf[ni:]))
                       + boundary_gather(c, topo) * geom.magsf[ni:])
        diag = boundary_scatter_add(
            diag.reshape(-1, 25),
            lam_b[:, None] * I5.reshape(25)[None, :],
            topo).reshape(-1, 5, 5)
        diag = diag + (geom.vol * inv_dt)[:, None, None] * I5
        dinv = jnp.linalg.inv(diag)

        def offdiag(x):
            """y[own] += N x[nei];  y[nei] += -P x[own] (upper/lower)."""
            x_o = cell_to_face_own(x, topo)
            x_n = cell_to_face_nei(x, topo)
            r_own = jnp.einsum("fij,fj->fi", N, x_n)
            r_nei = -jnp.einsum("fij,fj->fi", P, x_o)
            return face_sum_pair(r_own, r_nei, topo)

        def offdiag_T(x):
            """Transposed coupling: y[own] += -P^T x[nei]; y[nei] += N^T x[own]."""
            x_o = cell_to_face_own(x, topo)
            x_n = cell_to_face_nei(x, topo)
            r_own = -jnp.einsum("fji,fj->fi", P, x_n)
            r_nei = jnp.einsum("fji,fj->fi", N, x_o)
            return face_sum_pair(r_own, r_nei, topo)

        dinv_T = jnp.swapaxes(dinv, -1, -2)

        def make_solver(di, off):
            def solve(b):
                x = jnp.einsum("cij,cj->ci", di, b)
                for _ in range(sweeps):
                    x = jnp.einsum("cij,cj->ci", di, b - off(x))
                return x
            return solve

        return make_solver(dinv, offdiag), make_solver(dinv_T, offdiag_T)

    def _dQdW_blocks(self, state, inputs):
        """Full conservative-primitive transform dQ/dW, (nc,5,5):
        rows Q=(rho,rhoU,rhoE), cols W=(p,Ux,Uy,Uz,T), perfect gas."""
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        U, p, T = state["U"], state["p"], state["T"]
        psi = 1.0 / (R * T)
        rho = p * psi
        q2 = jnp.sum(U * U, -1)
        E = Cv * T + 0.5 * q2
        nc = rho.shape[0]
        D = jnp.zeros((nc, 5, 5), U.dtype)
        D = D.at[:, 0, 0].set(psi)
        D = D.at[:, 0, 4].set(-rho / T)
        D = D.at[:, 1:4, 0].set(psi[:, None] * U)
        D = D.at[:, 1:4, 1:4].set(rho[:, None, None]
                                  * jnp.eye(3, dtype=U.dtype))
        D = D.at[:, 1:4, 4].set(-(rho / T)[:, None] * U)
        D = D.at[:, 4, 0].set(psi * E)
        D = D.at[:, 4, 1:4].set(rho[:, None] * U)
        D = D.at[:, 4, 4].set(rho * Cv - rho * E / T)
        return D

    def make_adjoint_pc(self, state, inputs):
        """Adjoint GMRES PC: transpose of the coupled block-Rusanov
        Jacobian (the same operator the primal PTC preconditions with).

        The scaled adjoint operator is matT = D_W J^T D_R^{-1} with
        J = dR/dW = -(1/V) C dQdW (R the per-volume residual, C the
        first-order flux Jacobian); its inverse is
        -D_R diag(V) C^{-T} dQdW^{-T} D_W^{-1}, applied with transposed
        block-Jacobi sweeps.  A small pseudo-time shift (pcCfl) keeps the
        sweeps diagonally dominant.  Unpreconditioned GMRES stalls at
        rel ~0.8 on the transonic bump adjoint; model states (turbulence)
        pass through untouched."""
        geom = self.geometry(inputs)
        opt = self.option["adjEqnOption"]
        sweeps = int(opt.get("pcInnerIters", 12))
        cfl_pc = float(opt.get("pcCfl", 1e4))
        inv_dt = self._inv_dtau(state, inputs, geom, cfl_pc)
        _, pc_T = self._block_pc(state, inputs, geom, inv_dt, sweeps)
        dQdW_T = jnp.swapaxes(self._dQdW_blocks(state, inputs), -1, -2)
        scales = self.state_scales(geom)

        def prec(v):
            u = jnp.concatenate(
                [(v["p"] / scales["p"])[:, None],
                 v["U"] / scales["U"],
                 (v["T"] / scales["T"])[:, None]], axis=1)
            w = jnp.linalg.solve(dQdW_T, u[..., None])[..., 0]
            y = -pc_T(w) * geom.vol[:, None]
            out = dict(v)
            out["p"] = y[:, 0] * scales["p"]
            out["U"] = y[:, 1:4] * scales["U"]
            out["T"] = y[:, 4] * scales["T"]
            return out

        return prec

    def make_forward_pc(self, state, inputs):
        """PC for the forward linearized system dR/dW (same block-Rusanov
        operator, untransposed): J^{-1} ~ -dQdW^{-1} C^{-1} diag(V)."""
        geom = self.geometry(inputs)
        opt = self.option["adjEqnOption"]
        sweeps = int(opt.get("pcInnerIters", 12))
        cfl_pc = float(opt.get("pcCfl", 1e4))
        inv_dt = self._inv_dtau(state, inputs, geom, cfl_pc)
        pc_f, _ = self._block_pc(state, inputs, geom, inv_dt, sweeps)
        dQdW = self._dQdW_blocks(state, inputs)

        def prec(r):
            b = jnp.concatenate(
                [(r["p"] * geom.vol)[:, None],
                 r["U"] * geom.vol[:, None],
                 (r["T"] * geom.vol)[:, None]], axis=1)
            y = pc_f(b)
            dw = -jnp.linalg.solve(dQdW, y[..., None])[..., 0]
            out = dict(r)
            out["p"] = dw[:, 0]
            out["U"] = dw[:, 1:4]
            out["T"] = dw[:, 4]
            return out

        return prec

    def solve_primal(self, state, inputs):
        geom = self.geometry(inputs)
        opt = self.option
        h = opt.get("hisa", {})
        cfl0 = float(h.get("cfl", 2.0))
        cfl_max = float(h.get("cflMax", 1e4))
        relax = float(h.get("relax", 1.0))
        # full (unrestarted) GMRES per Newton step: restarted GMRES
        # stagnates on the indefinite high-CFL PTC system
        inner_iters = int(h.get("innerIters", 200))
        inner_tol = float(h.get("innerRelTol", 1e-6))
        pc_iters = int(h.get("pcIters", 8))
        tol = opt["primalMinResTol"]
        max_it = opt["primalMaxIters"]
        min_it = opt["primalMinIters"]
        tol_diff = float(opt["primalMinResTolDiff"])
        lin = opt["primalLinearSolver"]

        flow_keys = ("U", "p", "T")

        def res_flow(st, scheme=None):
            r = self._residuals_geom(st, inputs, geom, scheme=scheme)
            return {k: r[k] for k in flow_keys}

        def res_norm(r, st):
            R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
            # scale each equation to comparable magnitude
            uref = float(opt["normalizeStates"].get("U", 1.0))
            pref = float(opt["normalizeStates"].get("p", 1.0))
            tref = float(opt["normalizeStates"].get("T", 1.0))
            rr = jnp.sqrt(
                (jnp.sum((r["U"] / uref) ** 2)
                 + jnp.sum((r["p"] / pref) ** 2)
                 + jnp.sum((r["T"] / tref) ** 2)) / (5.0 * r["p"].shape[0]))
            return rr

        R_, gamma_, Cv_, mu_, Pr_, Prt_ = self._thermo(inputs)
        uref = float(opt["normalizeStates"].get("U", 1.0))
        eref = Cv_ * float(opt["normalizeStates"].get("T", 300.0)) \
            + 0.5 * uref ** 2
        row_s = {"p": 1.0, "U": uref, "T": eref}

        def one_iter(st, cfl, scheme):
            flow = {k: st[k] for k in flow_keys}
            Rv, lin_fn = jax.linearize(
                lambda f: res_flow({**st, **f}, scheme), flow)
            inv_dt = self._inv_dtau(st, inputs, geom, cfl)
            # diagonal of the conservative-primitive transform dQ/dW:
            # d(rho)/dp = psi, d(rhoU)/dU = rho, d(rhoE)/dT = rho Cv
            rho = st["p"] / (R_ * st["T"])
            mdiag = {"p": 1.0 / (R_ * st["T"]), "U": rho, "T": rho * Cv_}

            # implicit pseudo-time Euler on dQ/dtau = R(W):
            #   (diag(dQ/dW)/dtau - dR/dW) dW = R(W)
            # rows scaled to comparable magnitude (rho / rhoU / rhoE units)
            # so the flat GMRES norm is not dominated by the energy rows.
            def matvec(v):
                jv = lin_fn(v)
                out = {}
                for k in v:
                    md = mdiag[k] * inv_dt
                    if v[k].ndim == 2:
                        md = md[:, None]
                    out[k] = (md * v[k] - jv[k]) / row_s[k]
                return out

            # coupled block PC: approximate (V/dtau + d(divF)/dQ)^{-1} in
            # conservative variables, then map the increment to primitive
            # with the full dQ/dW block (the acoustic p-U-T coupling is
            # what the scalar PC missed)
            pc_solve, _ = self._block_pc(st, inputs, geom, inv_dt, pc_iters)
            dQdW = self._dQdW_blocks(st, inputs)

            def prec(v):
                b = jnp.concatenate(
                    [(v["p"] * row_s["p"] * geom.vol)[:, None],
                     v["U"] * row_s["U"] * geom.vol[:, None],
                     (v["T"] * row_s["T"] * geom.vol)[:, None]], axis=1)
                xq = pc_solve(b)
                dw = jnp.linalg.solve(dQdW, xq[..., None])[..., 0]
                return {"p": dw[:, 0], "U": dw[:, 1:4], "T": dw[:, 4]}

            rhs = {k: Rv[k] / row_s[k] for k in Rv}
            dW, _ = gmres(matvec, rhs, precond=prec, restart=inner_iters,
                          rel_tol=inner_tol, abs_tol=0.0,
                          max_iters=inner_iters)

            # backtracking line search over the Newton direction (the
            # JT-KIRK physicality/line-search role in hisa's
            # jacobianTimeKrylov solver)
            cands = (1.0, 0.5, 0.25)

            def try_relax(a):
                new_f = {k: self._bound(k, st[k] + relax * a * dW[k])
                         for k in flow_keys}
                rn = res_norm(res_flow({**st, **new_f}, scheme), st)
                return new_f, rn

            trials = [try_relax(a) for a in cands]
            rs = jnp.stack([r for _, r in trials])
            best = jnp.argmin(rs)
            rnew = rs[best]
            new = dict(st)
            for k in flow_keys:
                new[k] = jnp.stack([t[0][k] for t in trials])[best]
            if self.turb.model_states:
                bcos = self._bcos(new, inputs, geom)
                (phi, _, _, U_b, p_b, T_b, rho, rho_b, _) = self._fluxes(
                    new, inputs, geom, bcos, scheme=scheme)
                rho_f = fvc.interpolate(geom, self.topo, rho, rho_b)
                phi_vol = phi / jnp.maximum(rho_f, 1e-36)
                gradU = fvc.grad(geom, self.topo, new["U"], U_b)
                new = self.turb.correct(
                    new, inputs, geom, phi_vol, gradU=gradU,
                    rel_tol=lin["turbRelTol"],
                    max_iters=lin["turbMaxIters"], relax=0.7)
                rnew = res_norm(res_flow(new, scheme), new)
            return new, rnew

        cfl_min = float(h.get("cflMin", 1.0))
        # revert-to-best threshold: reverting (instead of reject-and-freeze)
        # keeps the state moving — a frozen state retries the identical
        # step forever once the CFL hits its floor (observed deadlock)
        revert = float(h.get("revertFactor", 4.0))

        def ptc_loop(state0, scheme, cfl_start, stop_rel, loop_max,
                     loop_min, stop_abs=None):
            """SER-PTC with best-so-far safeguard: every iteration takes
            the best line-search candidate (classic SER — the residual may
            transiently rise), the CFL follows the residual ratio, and a
            blow-up beyond `revert` x best reverts to the best state with
            a 10x CFL cut.  Stops at stop_rel x (this loop's starting
            residual), or at stop_abs when given."""
            res_start = res_norm(res_flow(state0, scheme), state0)
            stop_res = stop_rel * res_start if stop_abs is None \
                else stop_abs

            def cond(c):
                st, cfl, res, best_st, best_res, it = c
                keep = jnp.logical_or(it < loop_min, res > stop_res)
                keep = jnp.logical_and(keep, it < loop_max)
                return jnp.logical_and(keep, self.states_valid(st))

            def body(c):
                st, cfl, res, best_st, best_res, it = c
                st2, rnew = one_iter(st, cfl, scheme)
                bad = jnp.logical_or(rnew > revert * best_res,
                                     ~self.states_valid(st2))
                st3 = jax.tree_util.tree_map(
                    lambda b, s: jnp.where(bad, b, s), best_st, st2)
                res3 = jnp.where(bad, best_res, rnew)
                ratio = res / jnp.maximum(rnew, guard_tiny(rnew.dtype))
                cfl_ser = jnp.clip(cfl * jnp.clip(ratio, 0.3, 2.5),
                                   cfl_min, cfl_max)
                cfl3 = jnp.where(bad, jnp.maximum(cfl * 0.1, cfl_min),
                                 cfl_ser)
                better = rnew < best_res
                upd = jnp.logical_and(better, ~bad)
                best_st2 = jax.tree_util.tree_map(
                    lambda b, s: jnp.where(upd, s, b), best_st, st2)
                best_res2 = jnp.where(upd, rnew, best_res)
                if bool(h.get("debugPrint", False)):
                    jax.debug.print(
                        "[{s}] it={it} res={r:.4e} rnew={rn:.4e} "
                        "cfl={c:.2e} best={b:.4e} bad={a}", s=scheme,
                        it=it, r=res, rn=rnew, c=cfl, b=best_res, a=bad)
                return st3, cfl3, res3, best_st2, best_res2, it + 1

            st_f, cfl_f, res_f, best_st, best_res, it_f = jax.lax.while_loop(
                cond, body,
                (state0, jnp.asarray(cfl_start, self.dtype), res_start,
                 state0, res_start, jnp.asarray(0)))
            # return the best state seen, not the last
            take_best = best_res < res_f
            st_out = jax.tree_util.tree_map(
                lambda b, s: jnp.where(take_best, b, s), best_st, st_f)
            return st_out, cfl_f, jnp.minimum(best_res, res_f), it_f

        r0 = res_norm(res_flow(state), state)

        # flux sequencing: drive the smooth first-order laxFriedrichs
        # residual into its Newton basin first, then polish with the
        # configured (AUSM/JST) flux warm-started from it — the kinked
        # AUSM switches limit-cycle plain PTC from uniform flow.
        it1 = jnp.asarray(0)
        st = state
        cfl_start = cfl0
        if bool(h.get("sequenceFlux", True)) \
                and self.flux_scheme != "laxFriedrichs":
            s1_rel = float(h.get("stage1RelTol", 1e-4))
            s1_max = int(h.get("stage1MaxIters", 150))
            st, _cfl1, _res1, it1 = ptc_loop(
                state, "laxFriedrichs", cfl0, s1_rel, s1_max, 0)
            cfl_start = float(h.get("stage2Cfl", 50.0))

        st, cfl, res, it2 = ptc_loop(
            st, self.flux_scheme, cfl_start, tol, max_it, min_it,
            stop_abs=tol * r0)
        it = it1 + it2
        ok = self.states_valid(st)
        rel = res / jnp.maximum(r0, 1e-30)
        failed = jnp.logical_not(ok)
        if tol > 0:
            failed = jnp.logical_or(failed, rel > tol * tol_diff)
        return st, PrimalInfo(it, rel, jnp.logical_and(rel <= tol, ok),
                              failed)

    def init_state(self):
        st = super().init_state()
        if float(jnp.max(jnp.abs(st["T"]))) == 0.0:
            st["T"] = jnp.full_like(st["T"], 300.0)
        if float(jnp.max(jnp.abs(st["p"]))) == 0.0:
            st["p"] = jnp.full_like(st["p"], 1e5)
        return st

    # -- functions context ------------------------------------------------
    def boundary_fields(self, state, inputs, geom):
        topo = self.topo
        bcos = self._bcos(state, inputs, geom)
        return {k: bc.boundary_value(bcos[k], state[k], topo)
                for k in ("U", "p", "T")}

    def aux_fields(self, state, inputs, geom):
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        return {"rho": self.rho_of(state, inputs),
                "gamma": gamma, "Cp": Cv * gamma, "R": R}

    def rho_of(self, state, inputs):
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        return state["p"] / (R * state["T"])

    def function_ctx(self, state, inputs, with_residuals=False):
        ctx = super().function_ctx(state, inputs, with_residuals)
        geom = ctx["geom"]
        topo = self.topo
        ni = topo.n_internal
        bcos = self._bcos(state, inputs, geom)
        U_b = bc.boundary_value(bcos["U"], state["U"], topo)
        gradU = fvc.grad(geom, topo, state["U"], U_b)
        sng_b = bc.boundary_sngrad(bcos["U"], state["U"], topo)
        nhat = geom.sf[ni:] / jnp.maximum(geom.magsf[ni:], 1e-36)[:, None]
        gU_own = boundary_gather(gradU, topo)
        ctx["gradU_b"] = gU_own + nhat[:, :, None] * (
            sng_b - jnp.einsum("fi,fij->fj", nhat, gU_own))[:, None, :]
        R, gamma, Cv, mu, Pr, Prt = self._thermo(inputs)
        rho = self.rho_of(state, inputs)
        rho_b = boundary_gather(rho, topo)
        nut_b = self.turb.nut_boundary(state, inputs, geom)
        ctx["nu_eff_b"] = nut_b + mu / jnp.maximum(rho_b, 1e-36)
        ctx["rho_ref"] = rho_b
        ctx["rho_b"] = rho_b
        return ctx
