"""Steady compressible SIMPLE solver (subsonic) + transonic SIMPLEC variant.

Capability parity with the reference's DARhoSimpleFoam
(src/adjoint/DASolver/DARhoSimpleFoam/, residual
DAResidualRhoSimpleFoam.C) and DARhoSimpleCFoam (transonic SIMPLEC,
DAResidualRhoSimpleCFoam.C). Perfect-gas thermo (rho = p/(R T), h = Cp T,
constant mu), mass-flux states:

    R_U   = (UEqn & U) + grad(p),  UEqn = div(phi,U) + divDevRhoReff(U)
    R_T   = (EEqn & T) with EEqn = Cp[div(phi,T) - laplacian(alphaEff, T)]
            + div(phi, K) (kinetic-energy transport, K = |U|^2/2)
    R_p   = pEqn & p,  pEqn = laplacian(rho rAU, p) == div(phiHbyA),
            phiHbyA = rho_f flux(HbyA)   [+ psi-convection for transonic]
    R_phi = phiHbyA - pEqn.flux() - phi          (phi = MASS flux)

Turbulence: laminar or SpalartAllmaras on the volumetric flux phi/rho_f
(mut = rho nut).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.mesh.geometry import compute_geometry
from dafoam_tpu.mesh.walldist import compute_wall_distance
from dafoam_tpu.models import make_turbulence_model, _TURB_REGISTRY
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import DASolverBase, PrimalInfo
from dafoam_tpu.states import StateInfo


class DARhoSimpleFoam(DASolverBase):
    transonic = False

    def __init__(self, option, topo, points):
        from dafoam_tpu.option import DAOption
        opt = option if isinstance(option, DAOption) else DAOption(option)
        turb_name = opt["turbulenceModel"]
        model_states = _TURB_REGISTRY[turb_name].model_states
        self.state_info = StateInfo(vol_vector=("U",),
                                    vol_scalar=("p", "T"),
                                    model=tuple(model_states),
                                    surface_scalar=("phi",))
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
        self._user_bounds = (option.get("primalVarBounds", {})
                             if isinstance(option, dict) else {})
        self.turb.setup_wall_functions(self.bc_spec)

    # -- thermo ----------------------------------------------------------
    def _thermo(self, inputs):
        p = inputs["params"]
        return (p.get("Cp", 1004.5), p.get("R", 287.0), p.get("mu", 1.8e-5),
                p.get("Pr", 0.7), p.get("Prt", 0.9))

    def rho_of(self, state, inputs):
        Cp, R, mu, Pr, Prt = self._thermo(inputs)
        return state["p"] / (R * state["T"])

    # -- BC helpers -------------------------------------------------------
    def _bco(self, name, field, inputs, geom, phi, rank):
        vals = inputs["bc"].get(name, {})
        if name == "U":
            mrf = self.option.get("MRF", {})
            if mrf.get("active") and mrf.get("rotatingPatches"):
                from dafoam_tpu import mrf as mrfm
                vals = dict(vals)
                vals.update(mrfm.rotating_wall_values(
                    mrf, geom, self.topo, mrf["rotatingPatches"], inputs,
                    self.dtype))
        return bc.coeffs(self.bc_spec[name], vals,
                         self.topo, geom, field, rank=rank,
                         phi_b=phi[self.topo.n_internal:])

    def _nut(self, state, inputs, geom):
        return self.turb.nut(state, inputs, geom)

    # -- momentum ----------------------------------------------------------
    def _ueqn(self, state, inputs, geom, is_pc=False):
        topo = self.topo
        U, phi = state["U"], state["phi"]
        Cp, R, mu, Pr, Prt = self._thermo(inputs)
        rho = self.rho_of(state, inputs)
        U_bco = self._bco("U", U, inputs, geom, phi, 1)
        # dynamic effective viscosity
        mut = rho * self._nut(state, inputs, geom)
        mut_b = rho[topo.owner[topo.n_internal:]] * \
            self.turb.nut_boundary(state, inputs, geom)
        mu_eff = mu + mut
        mu_eff_b = mu + mut_b
        mu_eff_f = fvc.interpolate(geom, topo, mu_eff, mu_eff_b)
        scheme = self.option["divSchemes"].get("div(phi,U)", "upwind")
        M = fvm.div(geom, topo, phi, U, U_bco, scheme=scheme, bounded=True) \
            - fvm.laplacian(geom, topo, mu_eff_f, U, U_bco)
        # explicit dev2 transpose term
        U_b = bc.boundary_value(U_bco, U, topo)
        gradU = fvc.grad(geom, topo, U, U_b)
        gt = jnp.swapaxes(gradU, -1, -2)
        tr = jnp.trace(gradU, axis1=-2, axis2=-1)
        eye = jnp.eye(3, dtype=U.dtype)
        Tc = mu_eff[:, None, None] * (gt - (2.0 / 3.0)
                                      * tr[..., None, None] * eye)
        Tb = mu_eff_b[:, None, None] * 0.0 + Tc[topo.owner[topo.n_internal:]]
        expl = fvc.div_tensor(geom, topo, Tc, Tb)
        M = M.add_source(expl * geom.vol[:, None])
        mrf = self.option.get("MRF", {})
        if mrf.get("active"):
            from dafoam_tpu import mrf as mrfm
            # + rho * (Omega x U) in the zone (compressible MRF.DDt)
            dd = rho[:, None] * mrfm.ddt_source(mrf, U, geom, inputs)
            M = M.add_source(-dd * geom.vol[:, None])
        alpha = self.option["relaxationFactors"]["equations"].get("U", 0.7)
        M = fvx.relax(M, U, alpha, topo)
        return M, U_bco

    # -- energy -------------------------------------------------------------
    def _teqn(self, state, inputs, geom):
        topo = self.topo
        U, T, phi = state["U"], state["T"], state["phi"]
        Cp, R, mu, Pr, Prt = self._thermo(inputs)
        rho = self.rho_of(state, inputs)
        T_bco = self._bco("T", T, inputs, geom, phi, 0)
        mut = rho * self._nut(state, inputs, geom)
        alpha_eff = mu / Pr + mut / Prt
        alpha_eff_b = alpha_eff[topo.owner[topo.n_internal:]]
        alpha_f = fvc.interpolate(geom, topo, alpha_eff, alpha_eff_b)
        M = fvm.div(geom, topo, phi, T, T_bco, scheme="upwind",
                    bounded=True) \
            - fvm.laplacian(geom, topo, alpha_f, T, T_bco)
        M = FvScale(M, Cp)
        # kinetic-energy transport div(phi, K), explicit
        K = 0.5 * jnp.sum(U * U, axis=-1)
        U_bco = self._bco("U", U, inputs, geom, phi, 1)
        U_b = bc.boundary_value(U_bco, U, topo)
        K_b = 0.5 * jnp.sum(U_b * U_b, axis=-1)
        divK = fvc.div(geom, topo, phi, K, K_b)
        M = M.add_source(-divK * geom.vol)
        return M, T_bco

    # -- pressure/flux projection ---------------------------------------------
    def _projection(self, state, inputs, geom, UEqn, U_bco, U_pred,
                    transonic=None, rho_override=None):
        topo = self.topo
        ni = topo.n_internal
        if transonic is None:
            transonic = self.transonic
        p, phi = state["p"], state["phi"]
        Cp, R, mu, Pr, Prt = self._thermo(inputs)
        rho = self.rho_of(state, inputs) if rho_override is None \
            else rho_override
        p_bco = self._bco("p", p, inputs, geom, phi, 0)

        rAU = 1.0 / fvx.A(UEqn, geom)
        HbyA = rAU[:, None] * fvx.H(UEqn, U_pred, geom, topo)
        U_b = bc.boundary_value(U_bco, U_pred, topo)
        HbyA_b = U_b  # constrained
        rho_b = rho[topo.owner[ni:]]
        rho_f = fvc.interpolate(geom, topo, rho, rho_b)
        phiHbyA = rho_f * fvc.flux(geom, topo, HbyA, HbyA_b)
        mrf = self.option.get("MRF", {})
        if mrf.get("active"):
            from dafoam_tpu import mrf as mrfm
            # mass-flux makeRelative: phi -= rho_f (Omega x r).Sf
            phiHbyA = rho_f * mrfm.make_relative(
                mrf, phiHbyA / jnp.maximum(rho_f, 1e-36), geom, topo,
                inputs)

        rho_rAU = rho * rAU
        rr_b = rho_rAU[topo.owner[ni:]]
        rr_f = fvc.interpolate(geom, topo, rho_rAU, rr_b)
        lapM = fvm.laplacian(geom, topo, rr_f, p, p_bco)

        if transonic:
            # transonic (reference DARhoSimpleCFoam): the mass flux is
            # linearized in p through rho_f = psi_f p_f:
            # pEqn = div(phid, p) - laplacian(rho rAU, p) = 0,
            # phid = psi_f * flux(HbyA); flux(p) = divflux + (-lapflux).
            psi = 1.0 / (R * state["T"])
            psi_b = psi[topo.owner[ni:]]
            psi_f = fvc.interpolate(geom, topo, psi, psi_b)
            F = phiHbyA / jnp.maximum(rho_f, 1e-36)   # volumetric HbyA flux
            phid = psi_f * F
            divM = fvm.div(geom, topo, phid, p, p_bco, scheme="upwind")
            pM = divM - lapM   # matvec - source == div(phid,p) - lap(p)
            # OpenFOAM rhoSimpleFoam transonic: "Relax the pressure
            # equation to ensure diagonal-dominance" (pEqn.relax()) — the
            # upwind div(phid, p) matrix is only weakly dominant and the
            # unrelaxed solve destabilizes the outer loop
            a_eq_p = self.option["relaxationFactors"]["equations"] \
                .get("p", 1.0)
            if a_eq_p < 1.0:
                pM = fvx.relax(pM, p, a_eq_p, topo)

            def flux_fn(p_new, grad_p=None):
                return fvm.div_flux(geom, topo, phid, p_new, p_bco) \
                    - fvm.laplacian_flux(geom, topo, rr_f, p_new, p_bco)
        else:
            pM = lapM.add_source(
                fvc.div_surface(geom, topo, phiHbyA) * geom.vol)

            def flux_fn(p_new, grad_p=None):
                return phiHbyA - fvm.laplacian_flux(geom, topo, rr_f, p_new,
                                                    p_bco)
        return rAU, rr_f, HbyA, phiHbyA, pM, p_bco, flux_fn

    # -- residuals ----------------------------------------------------------
    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        topo = self.topo
        U, p, T, phi = state["U"], state["p"], state["T"], state["phi"]
        UEqn, U_bco = self._ueqn(state, inputs, geom)
        p_bco0 = self._bco("p", p, inputs, geom, phi, 0)
        p_b = bc.boundary_value(p_bco0, p, topo)
        gradp = fvc.grad(geom, topo, p, p_b)
        rho = self.rho_of(state, inputs)
        r_U = fvx.residual(UEqn, U, geom, topo) + gradp
        rAU, rr_f, HbyA, phiHbyA, pM, p_bco, flux_fn = self._projection(
            state, inputs, geom, UEqn, U_bco, U)
        r_p = fvx.residual(pM, p, geom, topo)
        r_phi = flux_fn(p) - phi
        TEqn, T_bco = self._teqn(state, inputs, geom)
        r_T = fvx.residual(TEqn, T, geom, topo)
        out = {"U": r_U, "p": r_p, "T": r_T, "phi": r_phi}
        if self.turb.model_states:
            U_b = bc.boundary_value(U_bco, U, topo)
            gradU = fvc.grad(geom, topo, U, U_b)
            rho_b = rho[topo.owner[topo.n_internal:]]
            rho_f = fvc.interpolate(geom, topo, rho, rho_b)
            phi_vol = phi / jnp.maximum(rho_f, 1e-36)
            out.update(self.turb.residuals(state, inputs, geom, phi_vol,
                                           gradU=gradU))
        return out

    # -- primal ----------------------------------------------------------------
    def _bound(self, name, v):
        b = dict(self.option["primalVarBounds"])
        b.update(self._user_bounds)
        lo, hi = b.get(name + "Min"), b.get(name + "Max")
        return jnp.clip(v, lo, hi)

    def init_state(self):
        st = super().init_state()
        geom = compute_geometry(self.points, self.topo)
        inputs = self.make_inputs()
        Ubco = bc.coeffs(self.bc_spec["U"], inputs["bc"].get("U", {}),
                         self.topo, geom, st["U"], rank=1,
                         phi_b=jnp.zeros((self.topo.n_boundary,), self.dtype))
        U_b = bc.boundary_value(Ubco, st["U"], self.topo)
        rho = self.rho_of(st, inputs)
        rho_b = rho[self.topo.owner[self.topo.n_internal:]]
        rho_f = fvc.interpolate(geom, self.topo, rho, rho_b)
        st["phi"] = rho_f * fvc.flux(geom, self.topo, st["U"], U_b)
        return st

    def solve_primal(self, state, inputs):
        geom = self.geometry(inputs)
        topo = self.topo
        opt = self.option
        lin = opt["primalLinearSolver"]
        alpha_p = opt["relaxationFactors"]["fields"].get("p", 0.3)
        tol = opt["primalMinResTol"]

        # rho under-relaxation (OpenFOAM relaxationFactors fields rho):
        # the canonical stabilizer for compressible SIMPLE above M ~ 0.3 —
        # damps the rho(p,T) <-> mass-flux feedback.  1.0 = off.  Only the
        # ITERATION path is damped; the converged state satisfies the
        # unrelaxed residuals (rho_relaxed == rho there).
        alpha_rho = opt["relaxationFactors"]["fields"].get("rho", 1.0)

        def one_iter(state, rho_prev=None, transonic=None):
            if transonic is None:
                transonic = self.transonic
            U, p, T = state["U"], state["p"], state["T"]
            UEqn, U_bco = self._ueqn(state, inputs, geom)
            p_bco = self._bco("p", p, inputs, geom, state["phi"], 0)
            p_b = bc.boundary_value(p_bco, p, topo)
            gradp = fvc.grad(geom, topo, p, p_b)
            rhs_U = -gradp * geom.vol[:, None]
            res_U = fvsolve.initial_residual_norm(UEqn, U, topo, rhs=rhs_U)
            U_pred, _ = fvsolve.solve(UEqn, U, topo, symmetric=False,
                                      rel_tol=lin["uRelTol"],
                                      max_iters=lin["uMaxIters"], rhs=rhs_U)
            U_pred = self._bound("U", U_pred)
            st = dict(state, U=U_pred)

            # energy
            TEqn, T_bco = self._teqn(st, inputs, geom)
            TEqn_r = fvx.relax(TEqn, T,
                               opt["relaxationFactors"]["equations"]
                               .get("T", 0.7), topo)
            T_new, _ = fvsolve.solve(TEqn_r, T, topo, symmetric=False,
                                     rel_tol=lin["turbRelTol"],
                                     max_iters=lin["turbMaxIters"])
            T_new = self._bound("T", T_new)
            st = dict(st, T=T_new)

            # pressure (with relaxed density in the mass flux)
            rho_raw = self.rho_of(st, inputs)
            rho_used = rho_raw if rho_prev is None else \
                rho_prev + alpha_rho * (rho_raw - rho_prev)
            rAU, rr_f, HbyA, phiHbyA, pM, p_bco2, flux_fn = self._projection(
                st, inputs, geom, UEqn, U_bco, U_pred, transonic=transonic,
                rho_override=rho_used)
            res_p = fvsolve.initial_residual_norm(pM, p, topo)
            p_new, _ = fvsolve.solve(pM, p, topo,
                                     symmetric=not transonic,
                                     rel_tol=lin["pRelTol"],
                                     max_iters=lin["pMaxIters"])
            phi_new = flux_fn(p_new)
            p_rel = self._bound("p", p + alpha_p * (p_new - p))
            pb3 = self._bco("p", p_rel, inputs, geom, phi_new, 0)
            p_b3 = bc.boundary_value(pb3, p_rel, topo)
            gradp3 = fvc.grad(geom, topo, p_rel, p_b3)
            U_new = self._bound("U", HbyA - rAU[:, None] * gradp3)
            st = dict(st, U=U_new, p=p_rel, phi=phi_new)

            if self.turb.model_states:
                rho = self.rho_of(st, inputs)
                rho_b = rho[topo.owner[topo.n_internal:]]
                rho_f = fvc.interpolate(geom, topo, rho, rho_b)
                phi_vol = phi_new / jnp.maximum(rho_f, 1e-36)
                U_bco2 = self._bco("U", U_new, inputs, geom, phi_new, 1)
                U_b = bc.boundary_value(U_bco2, U_new, topo)
                gradU = fvc.grad(geom, topo, U_new, U_b)
                st = self.turb.correct(st, inputs, geom, phi_vol,
                                       gradU=gradU,
                                       rel_tol=lin["turbRelTol"],
                                       max_iters=lin["turbMaxIters"])
            return st, rho_used, jnp.maximum(res_U, res_p)

        def cond(c):
            st, rho_c, it, res = c
            keep = jnp.logical_or(it < opt["primalMinIters"], res > tol)
            keep = jnp.logical_and(keep, it < opt["primalMaxIters"])
            return jnp.logical_and(keep, self.states_valid(st))

        def body(c):
            st, rho_c, it, res = c
            st2, rho2, r2 = one_iter(st, rho_prev=rho_c)
            return st2, rho2, it + 1, r2

        state, rho0, it0 = self._pre_loop(state, inputs, one_iter)
        st, _, it, res = jax.lax.while_loop(
            cond, body, (state, rho0, jnp.asarray(0),
                         jnp.asarray(jnp.inf, self.dtype)))
        ok = self.states_valid(st)
        return st, PrimalInfo(it + it0, res,
                              jnp.logical_and(res <= tol, ok),
                              jnp.logical_not(ok))

    def _pre_loop(self, state, inputs, one_iter):
        """Hook for formulation sequencing before the main loop (the
        transonic subclass warm-starts with the subsonic formulation)."""
        return state, self.rho_of(state, inputs), jnp.asarray(0)

    # -- adjoint preconditioner --------------------------------------------
    def make_adjoint_pc(self, state, inputs):
        from dafoam_tpu.adjoint.precond import build_pc

        geom = self.geometry(inputs)
        UEqn, U_bco = self._ueqn(state, inputs, geom, is_pc=True)
        _, _, _, _, pM, _, _ = self._projection(state, inputs, geom, UEqn,
                                                U_bco, state["U"])
        TEqn, _ = self._teqn(state, inputs, geom)
        mats = {"U": (UEqn, False), "p": (pM, not self.transonic),
                "T": (TEqn, False)}
        return build_pc(mats, self.topo, geom, self.state_scales(geom),
                        self.option["adjEqnOption"])

    def make_forward_pc(self, state, inputs):
        """Untransposed block PC for forward_total_derivative's tangent
        GMRES (precond.build_forward_pc; without it the unpreconditioned
        solve stalls at rel 4e-8 on the heated channel)."""
        from dafoam_tpu.adjoint.precond import build_forward_pc

        geom = self.geometry(inputs)
        UEqn, U_bco = self._ueqn(state, inputs, geom, is_pc=True)
        _, _, _, _, pM, _, _ = self._projection(state, inputs, geom, UEqn,
                                                U_bco, state["U"])
        TEqn, _ = self._teqn(state, inputs, geom)
        mats = {"U": (UEqn, False), "p": (pM, not self.transonic),
                "T": (TEqn, False)}
        return build_forward_pc(mats, self.topo, geom,
                                self.option["adjEqnOption"])

    # -- functions --------------------------------------------------------------
    def boundary_fields(self, state, inputs, geom):
        topo = self.topo
        out = {}
        for name, rank in (("U", 1), ("p", 0), ("T", 0)):
            bco = self._bco(name, state[name], inputs, geom, state["phi"],
                            rank)
            out[name] = bc.boundary_value(bco, state[name], topo)
        return out

    def function_ctx(self, state, inputs, with_residuals=False):
        ctx = super().function_ctx(state, inputs, with_residuals)
        geom = ctx["geom"]
        topo = self.topo
        ni = topo.n_internal
        rho = self.rho_of(state, inputs)
        ctx["rho_b"] = rho[topo.owner[ni:]]
        ctx["rho_ref"] = 1.0  # forces use dimensional p directly
        U_bco = self._bco("U", state["U"], inputs, geom, state["phi"], 1)
        U_b = bc.boundary_value(U_bco, state["U"], topo)
        gradU = fvc.grad(geom, topo, state["U"], U_b)
        sng_b = bc.boundary_sngrad(U_bco, state["U"], topo)
        nhat = geom.sf[ni:] / jnp.maximum(geom.magsf[ni:], 1e-36)[:, None]
        own_b = topo.owner[ni:]
        gU = gradU[own_b]
        ctx["gradU_b"] = gU + nhat[:, :, None] * (
            sng_b - jnp.einsum("fi,fij->fj", nhat, gU))[:, None, :]
        Cp, R, mu, Pr, Prt = self._thermo(inputs)
        ctx["nu_eff_b"] = (mu + rho[own_b]
                           * self.turb.nut_boundary(state, inputs, geom)) \
            / jnp.maximum(rho[own_b], 1e-36)
        ctx["rho_ref"] = 1.0
        return ctx


def FvScale(m, a):
    return fvx.FvMatrix(diag=m.diag * a, lower=m.lower * a,
                        upper=m.upper * a, source=m.source * a)


class DARhoSimpleCFoam(DARhoSimpleFoam):
    """Transonic SIMPLEC variant (reference DARhoSimpleCFoam).

    The psi-linearized implicit div(phid, p) pressure equation has no
    upstream pressure anchor on a cold uniform start (measured: its exact
    first-iterate solution reaches negative p) — the standard practice of
    warm-starting transonic SIMPLE(C) from a subsonic solution is built in
    as formulation sequencing: `transonicInit*` options run the subsonic
    projection first, then the loop continues with the transonic one."""
    transonic = True

    def _pre_loop(self, state, inputs, one_iter):
        opt = self.option
        init_tol = float(opt.get("transonicInitRelTol", 1e-2))
        init_max = int(opt.get("transonicInitMaxIters", 500))
        rho0 = self.rho_of(state, inputs)
        if init_max <= 0:
            return state, rho0, jnp.asarray(0)

        def cond(c):
            st, rho_c, it, res = c
            keep = jnp.logical_and(res > init_tol, it < init_max)
            return jnp.logical_and(keep, self.states_valid(st))

        def body(c):
            st, rho_c, it, res = c
            st2, rho2, r2 = one_iter(st, rho_prev=rho_c, transonic=False)
            return st2, rho2, it + 1, r2

        st, rho_c, it, _ = jax.lax.while_loop(
            cond, body, (state, rho0, jnp.asarray(0),
                         jnp.asarray(jnp.inf, self.dtype)))
        return st, rho_c, it


class DATurboFoam(DARhoSimpleFoam):
    """Turbomachinery solver: compressible SIMPLE + MRF rotating zones
    (reference DATurboFoam, src/adjoint/DASolver/DATurboFoam/). The MRF
    terms activate through option["MRF"] (mrf.py); rotation speed is a
    differentiable input (inputs.params.MRF.omega)."""
    pass
