"""Langtry-Menter k-omega-SST-LM transition model (gamma-ReThetat).

Capability parity with the reference's DAkOmegaSSTLM
(src/adjoint/DAModel/DATurbulenceModel/DAkOmegaSSTLM.C, 1,530 LoC — its
largest turbulence model): two extra transport equations join the adjoint
state (correctModelStates adds "ReThetat" and "gammaInt",
DAkOmegaSSTLM.C:616-640), the k production is multiplied by gammaIntEff
(Pk, :357-360), the k destruction by min(max(gammaIntEff,0.1),1)
(epsilonByk, :363-368), and F1 gains the Ry term (F1, :348-355).

Empirical correlations follow the reference exactly:
  ReThetac  piecewise quartic / linear          (:393-421)
  Flength   piecewise + Fsublayer blend         (:424-475)
  Fonset    Rev/(2.193 ReThetac) cascade        (:478-494)
  ReThetat0 Tu/lambda fixed-point correlation   (:497-585)
  Fthetat   wake/BL blending                    (:371-391)

TPU-native notes: the reference's per-cell do-while for the lambda
fixed point (lambdaErr/maxLambdaIter) becomes a vectorized
lax.fori_loop with the default maxLambdaIter=10 sweeps — fully
differentiable, no data-dependent trip count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.models.komega_sst import (A1, BETA1, BETA2, BETA_STAR,
                                          GAMMA1, GAMMA2, SIGMA_K1, SIGMA_K2,
                                          SIGMA_W1, SIGMA_W2, KOmegaSST,
                                          _blend)
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx

# LM constants (reference DAkOmegaSSTLM.C:99-123 defaults)
CA1, CA2 = 2.0, 0.06
CE1, CE2 = 1.0, 50.0
C_THETAT = 0.03
SIGMA_THETAT = 2.0
MAX_LAMBDA_ITER = 10
SMALL_U = 1e-10


class KOmegaSSTLM(KOmegaSST):
    model_states = ("k", "omega", "ReThetat", "gammaInt")

    def __init__(self, topo, option, wall_dist=None, bc_spec=None):
        super().__init__(topo, option, wall_dist, bc_spec)
        self.bc_spec_ret = (bc_spec or {}).get("ReThetat", {})
        self.bc_spec_gam = (bc_spec or {}).get("gammaInt", {})

    # -- empirical correlations ------------------------------------------
    @staticmethod
    def _ReThetac(ret):
        """DAkOmegaSSTLM.C:393-421."""
        low = (ret - 396.035e-2 + 120.656e-4 * ret - 868.230e-6 * ret ** 2
               + 696.506e-9 * ret ** 3 - 174.105e-12 * ret ** 4)
        high = ret - 593.11 - 0.482 * (ret - 1870.0)
        return jnp.where(ret <= 1870.0, low, high)

    def _Flength(self, ret, nu, omega):
        """DAkOmegaSSTLM.C:424-475."""
        y = self.wall_dist
        f1 = 398.189e-1 - 119.270e-4 * ret - 132.567e-6 * ret ** 2
        f2 = (263.404 - 123.939e-2 * ret + 194.548e-5 * ret ** 2
              - 101.695e-8 * ret ** 3)
        f3 = 0.5 - 3e-4 * (ret - 596.0)
        fl = jnp.where(ret < 400.0, f1,
                       jnp.where(ret < 596.0, f2,
                                 jnp.where(ret < 1200.0, f3, 0.3188)))
        fsub = jnp.exp(-((y ** 2 * omega / (200.0 * nu)) ** 2))
        return fl * (1.0 - fsub) + 40.0 * fsub

    @staticmethod
    def _Fonset(rev, rethetac, rt):
        """DAkOmegaSSTLM.C:478-494."""
        f1 = rev / (2.193 * jnp.maximum(rethetac, 1e-10))
        f2 = jnp.minimum(jnp.maximum(f1, f1 ** 4), 2.0)
        f3 = jnp.maximum(1.0 - (rt / 2.5) ** 3, 0.0)
        return jnp.maximum(f2 - f3, 0.0)

    @staticmethod
    def _ReThetat0(Tu, dUsds, nu, Us):
        """Empirical freestream correlation with the lambda fixed point
        (DAkOmegaSSTLM.C:497-585), vectorized with a fixed sweep count."""
        dUsds_c = dUsds

        def thetat_of(lam):
            fneg = 1.0 - (-12.986 * lam - 123.66 * lam ** 2
                          - 405.689 * lam ** 3) * jnp.exp(
                              -((Tu / 1.5) ** 1.5))
            flam_lo = jnp.where(
                dUsds_c <= 0.0, fneg,
                1.0 + 0.275 * (1.0 - jnp.exp(-35.0 * lam))
                * jnp.exp(-Tu / 0.5))
            flam_hi = jnp.where(
                dUsds_c <= 0.0, fneg,
                1.0 + 0.275 * (1.0 - jnp.exp(-35.0 * lam))
                * jnp.exp(-2.0 * Tu))
            th_lo = (1173.51 - 589.428 * Tu + 0.2196 / Tu ** 2) \
                * flam_lo * nu / Us
            th_hi = 331.50 * jnp.maximum(Tu - 0.5658, 1e-6) ** (-0.671) \
                * flam_hi * nu / Us
            return jnp.where(Tu <= 1.3, th_lo, th_hi)

        def body(_, lam):
            th = thetat_of(lam)
            lam2 = th ** 2 / nu * dUsds_c
            return jnp.clip(lam2, -0.1, 0.1)

        lam = jax.lax.fori_loop(0, MAX_LAMBDA_ITER, body,
                                jnp.zeros_like(Tu))
        return jnp.maximum(thetat_of(lam) * Us / nu, 20.0)

    def _Fthetat(self, Us, Omega, nu, ret, gam, omega):
        """DAkOmegaSSTLM.C:371-391."""
        y = self.wall_dist
        delta = 375.0 * Omega * nu * ret * y / jnp.maximum(Us ** 2, 1e-36)
        re_om = y ** 2 * omega / nu
        fwake = jnp.exp(-((re_om / 1e5) ** 2))
        a = fwake * jnp.exp(-((y / jnp.maximum(delta, 1e-36)) ** 4))
        b = 1.0 - ((gam - 1.0 / CE2) / (1.0 - 1.0 / CE2)) ** 2
        return jnp.minimum(jnp.maximum(a, b), 1.0)

    # -- LM kinematics -----------------------------------------------------
    def _lm_fields(self, state, inputs, geom, gradU):
        nu = self.nu(inputs) * jnp.ones_like(state["k"])
        U = state["U"]
        k = jnp.maximum(state["k"], 1e-16)
        w = jnp.maximum(state["omega"], 1e-16)
        S = jnp.sqrt(self._strain2(gradU))
        skew = 0.5 * (gradU - jnp.swapaxes(gradU, -1, -2))
        Omega = jnp.sqrt(2.0 * jnp.maximum(
            jnp.sum(skew * skew, (-2, -1)), 1e-36))
        Us = jnp.maximum(jnp.linalg.norm(U, axis=-1), SMALL_U)
        # dUs/ds = (U . (U . gradU)) / Us^2  (gradU[i,j] = dU_j/dx_i)
        UgU = jnp.einsum("ci,cij->cj", U, gradU)
        dUsds = jnp.einsum("cj,cj->c", U, UgU) / Us ** 2
        Tu = jnp.maximum(100.0 * jnp.sqrt((2.0 / 3.0) * k) / Us, 0.027)
        y = self.wall_dist
        Rev = y ** 2 * S / nu
        RT = k / (nu * w)
        return nu, k, w, S, Omega, Us, dUsds, Tu, Rev, RT

    def gamma_int_eff(self, state, inputs, geom, gradU):
        """gammaIntEff = max(gammaInt, gammaSep) — separation-induced
        transition (DAkOmegaSSTLM.C:1255-1260)."""
        nu, k, w, S, Omega, Us, dUsds, Tu, Rev, RT = self._lm_fields(
            state, inputs, geom, gradU)
        ret = jnp.maximum(state["ReThetat"], 20.0)
        rethetac = self._ReThetac(ret)
        fthetat = self._Fthetat(Us, Omega, nu, ret, state["gammaInt"], w)
        freattach = jnp.exp(-((RT / 20.0) ** 4))
        gamma_sep = jnp.minimum(
            2.0 * jnp.maximum(Rev / (3.235 * jnp.maximum(rethetac, 1e-10))
                              - 1.0, 0.0) * freattach, 2.0) * fthetat
        return jnp.maximum(state["gammaInt"], gamma_sep)

    # -- SST overrides: F1 Ry term + gammaIntEff production/destruction ----
    def _f1_f2(self, state, inputs, geom, grads):
        f1, f2, cdkw = super()._f1_f2(state, inputs, geom, grads)
        nu = self.nu(inputs)
        k = jnp.maximum(state["k"], 1e-16)
        ry = self.wall_dist * jnp.sqrt(k) / nu
        f3 = jnp.exp(-((ry / 120.0) ** 8))
        return jnp.maximum(f1, f3), f2, cdkw

    def _assemble(self, state, inputs, geom, phi, gradU):
        """SST k/omega matrices with the LM coupling (Pk *= gammaIntEff,
        destruction *= min(max(gIeff,0.1),1))."""
        topo = self.topo
        nu = self.nu(inputs)
        k, w = state["k"], state["omega"]
        grads = self._grads(state, inputs, geom)
        f1, f2, cdkw = self._f1_f2(state, inputs, geom, grads)
        S2 = self._strain2(gradU)
        S = jnp.sqrt(S2)
        kpos = jnp.maximum(k, 1e-16)
        wpos = jnp.maximum(w, 1e-16)
        nut = A1 * kpos / jnp.maximum(A1 * wpos, f2 * S)
        g_eff = self.gamma_int_eff(state, inputs, geom, gradU)

        bk = bc.coeffs(self.bc_spec_k, inputs["bc"].get("k", {}), topo,
                       geom, k, rank=0, phi_b=phi[topo.n_internal:])
        bw = bc.coeffs(self.bc_spec_w, inputs["bc"].get("omega", {}), topo,
                       geom, w, rank=0, phi_b=phi[topo.n_internal:])
        own_b = topo.owner[topo.n_internal:]
        dk = nu + _blend(f1, SIGMA_K1, SIGMA_K2) * nut
        dw = nu + _blend(f1, SIGMA_W1, SIGMA_W2) * nut
        dk_f = fvc.interpolate(geom, topo, dk, dk[own_b])
        dw_f = fvc.interpolate(geom, topo, dw, dw[own_b])

        Pk = g_eff * jnp.minimum(nut * S2, 10.0 * BETA_STAR * kpos * wpos)
        destr_k = jnp.clip(g_eff, 0.1, 1.0) * BETA_STAR * wpos
        gamma = _blend(f1, GAMMA1, GAMMA2)
        beta = _blend(f1, BETA1, BETA2)

        Mk = fvm.div(geom, topo, phi, k, bk, scheme="upwind", bounded=True) \
            - fvm.laplacian(geom, topo, dk_f, k, bk)
        Mk = Mk.add_source(Pk * geom.vol)
        Mk = Mk + fvm.Sp(geom, topo, destr_k, k)

        Mw = fvm.div(geom, topo, phi, w, bw, scheme="upwind", bounded=True) \
            - fvm.laplacian(geom, topo, dw_f, w, bw)
        Mw = Mw.add_source((gamma * S2 + (1.0 - f1) * cdkw) * geom.vol)
        Mw = Mw + fvm.Sp(geom, topo, beta * wpos, w)
        return Mk, Mw

    # -- LM transport matrices --------------------------------------------
    def _assemble_lm(self, state, inputs, geom, phi, gradU):
        topo = self.topo
        nu, k, w, S, Omega, Us, dUsds, Tu, Rev, RT = self._lm_fields(
            state, inputs, geom, gradU)
        ret = state["ReThetat"]
        gam = state["gammaInt"]
        retpos = jnp.maximum(ret, 20.0)
        gampos = jnp.clip(gam, 1e-6, 1.0 + 1e-6)
        nut = self.nut_with_grad(state, inputs, geom, gradU)
        own_b = topo.owner[topo.n_internal:]

        b_ret = bc.coeffs(self.bc_spec_ret,
                          inputs["bc"].get("ReThetat", {}), topo, geom,
                          ret, rank=0, phi_b=phi[topo.n_internal:])
        b_gam = bc.coeffs(self.bc_spec_gam,
                          inputs["bc"].get("gammaInt", {}), topo, geom,
                          gam, rank=0, phi_b=phi[topo.n_internal:])

        # ReThetat eqn (DAkOmegaSSTLM.C:1176-1211)
        fthetat = self._Fthetat(Us, Omega, nu, retpos, gampos, w)
        t_scale = 500.0 * nu / Us ** 2
        p_thetat = C_THETAT / t_scale * (1.0 - fthetat)
        d_ret = SIGMA_THETAT * (nut + nu)
        d_ret_f = fvc.interpolate(geom, topo, d_ret, d_ret[own_b])
        ret0 = self._ReThetat0(Tu, dUsds, nu, Us)
        M_ret = fvm.div(geom, topo, phi, ret, b_ret, scheme="upwind",
                        bounded=True) \
            - fvm.laplacian(geom, topo, d_ret_f, ret, b_ret)
        M_ret = M_ret.add_source(p_thetat * ret0 * geom.vol)
        M_ret = M_ret + fvm.Sp(geom, topo, p_thetat, ret)

        # gammaInt eqn (DAkOmegaSSTLM.C:1222-1251)
        rethetac = self._ReThetac(retpos)
        fonset = self._Fonset(Rev, rethetac, RT)
        p_gamma = CA1 * self._Flength(retpos, nu, w) * S * jnp.sqrt(
            gampos * fonset + 1e-30)
        fturb = jnp.exp(-((0.25 * RT) ** 4))
        e_gamma = CA2 * Omega * fturb * gampos
        d_gam = nut + nu
        d_gam_f = fvc.interpolate(geom, topo, d_gam, d_gam[own_b])
        M_gam = fvm.div(geom, topo, phi, gam, b_gam, scheme="upwind",
                        bounded=True) \
            - fvm.laplacian(geom, topo, d_gam_f, gam, b_gam)
        M_gam = M_gam.add_source((p_gamma + e_gamma) * geom.vol)
        M_gam = M_gam + fvm.Sp(geom, topo, CE1 * p_gamma + CE2 * e_gamma,
                               gam)
        return M_ret, M_gam

    # -- framework hooks ----------------------------------------------------
    def pc_matrices(self, state, inputs, geom, phi, gradU):
        out = super().pc_matrices(state, inputs, geom, phi, gradU)
        M_ret, M_gam = self._assemble_lm(state, inputs, geom, phi, gradU)
        out["ReThetat"] = (M_ret, False)
        out["gammaInt"] = (M_gam, False)
        return out

    def residuals(self, state, inputs, geom, phi, gradU=None):
        out = super().residuals(state, inputs, geom, phi, gradU)
        M_ret, M_gam = self._assemble_lm(state, inputs, geom, phi, gradU)
        out["ReThetat"] = fvx.residual(M_ret, state["ReThetat"], geom,
                                       self.topo)
        out["gammaInt"] = fvx.residual(M_gam, state["gammaInt"], geom,
                                       self.topo)
        return out

    def correct(self, state, inputs, geom, phi, gradU=None,
                rel_tol=0.1, max_iters=100, relax=0.7, dt=None, old=None):
        # reference order (DAkOmegaSSTLM::correct): ReThetat -> gammaInt
        # (-> gammaIntEff) -> omega -> k
        M_ret, M_gam = self._assemble_lm(state, inputs, geom, phi, gradU)
        M_ret = fvx.relax(M_ret, state["ReThetat"], relax, self.topo)
        ret_new, _ = fvsolve.solve(M_ret, state["ReThetat"], self.topo,
                                   symmetric=False, rel_tol=rel_tol,
                                   max_iters=max_iters)
        st = dict(state, ReThetat=jnp.maximum(ret_new, 20.0))
        _, M_gam = self._assemble_lm(st, inputs, geom, phi, gradU)
        M_gam = fvx.relax(M_gam, st["gammaInt"], relax, self.topo)
        gam_new, _ = fvsolve.solve(M_gam, st["gammaInt"], self.topo,
                                   symmetric=False, rel_tol=rel_tol,
                                   max_iters=max_iters)
        st = dict(st, gammaInt=jnp.clip(gam_new, 0.02, 1.0))
        return super().correct(st, inputs, geom, phi, gradU=gradU,
                               rel_tol=rel_tol, max_iters=max_iters,
                               relax=relax, dt=dt, old=old)
