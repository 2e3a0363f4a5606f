"""Spalart–Allmaras one-equation model (differentiable, low-Re).

Capability parity with the reference's DASpalartAllmaras
(src/adjoint/DAModel/DATurbulenceModel/DASpalartAllmaras.C): nuTilda is an
adjoint model state, the transport residual is part of R(W), and nut is an
intermediate recomputed from nuTilda (the reference's correctNut). Wall
distance is a FROZEN precomputed field — the reference forces the same via
meshWaveFrozen for parallel adjoint accuracy (pyDAFoam.py:435-437).
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.models.base import TurbulenceModel
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx

# standard coefficients
SIGMA_NUT = 0.66666
KAPPA = 0.41
CB1 = 0.1355
CB2 = 0.622
CW1 = CB1 / KAPPA ** 2 + (1.0 + CB2) / SIGMA_NUT
CW2 = 0.3
CW3 = 2.0
CV1 = 7.1
CS = 0.3


def _fw_of_g(g):
    """fw(g) = g * ((1+cw3^6)/(g^6+cw3^6))^(1/6), in an f32-safe form.

    The literal expression forms g^6 ~ 7e32 at the r=10 clamp; its jvp
    (quotient + power rules) overflows float32 intermediates -> NaN
    adjoints on TPU. Rewrite with all intermediates O(1) using
    fw = A / (1+(c/g)^6)^(1/6)        for g >= c
       = A * (g/c) / (1+(g/c)^6)^(1/6) for g <  c
    (algebraically identical; A = (1+c^-6 * c^6... = (1+cw3^6)^(1/6)),
    branch-selected with double-where so the unselected branch never
    divides by a small g."""
    c = CW3
    A = (1.0 + c ** 6) ** (1.0 / 6.0)
    hi = g >= c
    g_hi = jnp.where(hi, g, c)         # >= c in the selected branch
    g_lo = jnp.where(hi, c, g)         # <= c in the selected branch
    t_hi = (c / g_hi) ** 6             # <= 1
    t_lo = (g_lo / c) ** 6             # <= 1
    fw_hi = A / (1.0 + t_hi) ** (1.0 / 6.0)
    fw_lo = A * (g_lo / c) / (1.0 + t_lo) ** (1.0 / 6.0)
    return jnp.where(hi, fw_hi, fw_lo)


class SpalartAllmaras(TurbulenceModel):
    model_states = ("nuTilda",)

    def __init__(self, topo, option, wall_dist=None, bc_spec=None):
        super().__init__(topo, option, wall_dist)
        bc_spec = bc_spec or {}
        # accept either the full boundaryConditions spec or the nuTilda one
        self.bc_spec = bc_spec.get("nuTilda", bc_spec)
        # field-inversion production multiplier beta(W; theta) — set by the
        # owning solver when a betaFI field or a regression model is
        # configured (reference DARegression / DAInputField betaFI path)
        self.beta_fn = None

    # ------------------------------------------------------------------
    def _chi_fv1(self, nuTilda, nu):
        chi = nuTilda / nu
        chi3 = chi ** 3
        fv1 = chi3 / (chi3 + CV1 ** 3)
        return chi, fv1

    def nut(self, state, inputs, geom):
        nu = self.nu(inputs)
        _, fv1 = self._chi_fv1(state["nuTilda"], nu)
        return state["nuTilda"] * fv1

    # ------------------------------------------------------------------
    def _stilda_fw(self, state, inputs, geom, gradU):
        nu = self.nu(inputs)
        nuTilda = state["nuTilda"]
        d = jnp.maximum(self.wall_dist, 1e-12)
        chi, fv1 = self._chi_fv1(nuTilda, nu)
        fv2 = 1.0 - chi / (1.0 + chi * fv1)
        skew = 0.5 * (gradU - jnp.swapaxes(gradU, -1, -2))
        omega = jnp.sqrt(2.0) * jnp.sqrt(
            jnp.maximum(jnp.sum(skew * skew, axis=(-2, -1)), 1e-36))
        inv_kd2 = 1.0 / (KAPPA ** 2 * d ** 2)
        stilda = jnp.maximum(omega + fv2 * nuTilda * inv_kd2, CS * omega)
        r = jnp.minimum(nuTilda / jnp.maximum(stilda, 1e-16) * inv_kd2, 10.0)
        g = r + CW2 * (r ** 6 - r)
        return stilda, _fw_of_g(g), d

    def _bco(self, state, inputs, geom, phi):
        return bc.coeffs(self.bc_spec, inputs["bc"].get("nuTilda", {}),
                         self.topo, geom, state["nuTilda"], rank=0,
                         phi_b=phi[self.topo.n_internal:])

    def _assemble(self, state, inputs, geom, phi, gradU, implicit_pd=True):
        """nuTilda transport matrix + sources.

        implicit_pd: destruction via Sp (primal stabilization, OpenFOAM
        style); the residual value at given state is identical either way.
        """
        topo = self.topo
        nu = self.nu(inputs)
        nuTilda = state["nuTilda"]
        bco = self._bco(state, inputs, geom, phi)
        nuT_b = bc.boundary_value(bco, nuTilda, topo)
        d_eff = (nu + nuTilda) / SIGMA_NUT
        d_eff_b = (nu + nuT_b) / SIGMA_NUT
        d_eff_f = fvc.interpolate(geom, topo, d_eff, d_eff_b)

        M = fvm.div(geom, topo, phi, nuTilda, bco, scheme="upwind",
                    bounded=True) \
            - fvm.laplacian(geom, topo, d_eff_f, nuTilda, bco)

        gn = fvc.grad(geom, topo, nuTilda, nuT_b)
        cross = CB2 / SIGMA_NUT * jnp.sum(gn * gn, axis=-1)
        stilda, fw, d = self._stilda_fw(state, inputs, geom, gradU)
        prod = CB1 * stilda * nuTilda
        if self.beta_fn is not None:
            prod = prod * self.beta_fn(state, inputs, geom, gradU)
        # sources on RHS: cross-diffusion + production
        M = M.add_source((cross + prod) * geom.vol)
        if implicit_pd:
            M = M + fvm.Sp(geom, topo, CW1 * fw * nuTilda / d ** 2, nuTilda)
        else:
            M = M.add_source(-CW1 * fw * (nuTilda / d) ** 2 * geom.vol)
        return M

    def pc_matrices(self, state, inputs, geom, phi, gradU):
        return {"nuTilda": (self._assemble(state, inputs, geom, phi, gradU),
                            False)}

    # ------------------------------------------------------------------
    def residuals(self, state, inputs, geom, phi, gradU=None):
        if gradU is None:
            raise ValueError("SA residuals need gradU")
        M = self._assemble(state, inputs, geom, phi, gradU)
        return {"nuTilda": fvx.residual(M, state["nuTilda"], geom, self.topo)}

    def solve_adjoint_fp(self, state, inputs, geom, phi, gradU, rhs,
                         sweeps=10, rel_tol=0.05, max_iters=40):
        """Fixed-point adjoint sweep on the transposed pseudo nuTilda
        equation (reference DATurbulenceModel::solveAdjointFP /
        constructPseudoNuTildaEqn, DATurbulenceModel.H:270-289): solve
        (M/V)^T psi = rhs approximately. Used standalone when
        adjEqnSolMethod == fixedPoint, or as a PC block."""
        from dafoam_tpu.adjoint.precond import _solve_T
        M = self._assemble(state, inputs, geom, phi, gradU)
        return _solve_T(M, rhs, self.topo, geom.vol, symmetric=False,
                        iters=max_iters)

    def correct(self, state, inputs, geom, phi, gradU=None,
                rel_tol=0.1, max_iters=100, relax=0.7, dt=None, old=None):
        from dafoam_tpu.ops import fvm as _fvm
        M = self._assemble(state, inputs, geom, phi, gradU)
        if dt is not None:
            M = M + _fvm.ddt(geom, self.topo, state["nuTilda"],
                             old["nuTilda"], dt)
        M = fvx.relax(M, state["nuTilda"], relax, self.topo)
        sol, _ = fvsolve.solve(M, state["nuTilda"], self.topo,
                               symmetric=False, rel_tol=rel_tol,
                               max_iters=max_iters)
        bounds = self.option["primalVarBounds"]
        sol = jnp.clip(sol, bounds["nuTildaMin"], bounds["nuTildaMax"])
        return dict(state, nuTilda=sol)


CV2_FV3 = 5.0


class SpalartAllmarasFv3(SpalartAllmaras):
    """SA with the fv3 modification (reference DASpalartAllmarasFv3, the
    OpenFOAM legacy SA variant used by many DAFoam cases): fv2/fv3 replace
    the standard fv2 in Stilda."""

    def _stilda_fw(self, state, inputs, geom, gradU):
        nu = self.nu(inputs)
        nuTilda = state["nuTilda"]
        d = jnp.maximum(self.wall_dist, 1e-12)
        chi, fv1 = self._chi_fv1(nuTilda, nu)
        chi_s = jnp.maximum(chi, 1e-12)
        fv2 = (1.0 + chi_s / CV2_FV3) ** (-3.0)
        fv3 = (1.0 + chi_s * fv1) * (1.0 - fv2) / chi_s
        skew = 0.5 * (gradU - jnp.swapaxes(gradU, -1, -2))
        omega = jnp.sqrt(2.0) * jnp.sqrt(
            jnp.maximum(jnp.sum(skew * skew, axis=(-2, -1)), 1e-36))
        inv_kd2 = 1.0 / (KAPPA ** 2 * d ** 2)
        stilda = fv3 * omega + fv2 * nuTilda * inv_kd2
        stilda = jnp.maximum(stilda, 1e-16)
        r = jnp.minimum(nuTilda / stilda * inv_kd2, 10.0)
        g = r + CW2 * (r ** 6 - r)
        return stilda, _fw_of_g(g), d
