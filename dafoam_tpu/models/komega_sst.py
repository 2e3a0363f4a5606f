"""Menter k-omega SST turbulence model (differentiable, low-Re).

Capability parity with the reference's DAkOmegaSST
(src/adjoint/DAModel/DATurbulenceModel/DAkOmegaSST.C, 968 LoC): k and
omega become adjoint model states, their transport residuals join R(W).
Standard 2003 constants with blending from the frozen wall distance.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.models.base import TurbulenceModel
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx

A1 = 0.31
BETA_STAR = 0.09
SIGMA_K1, SIGMA_K2 = 0.85, 1.0
SIGMA_W1, SIGMA_W2 = 0.5, 0.856
BETA1, BETA2 = 0.075, 0.0828
GAMMA1 = BETA1 / BETA_STAR - SIGMA_W1 * 0.41 ** 2 / BETA_STAR ** 0.5
GAMMA2 = BETA2 / BETA_STAR - SIGMA_W2 * 0.41 ** 2 / BETA_STAR ** 0.5


def _blend(f1, a, b):
    return f1 * a + (1.0 - f1) * b


class KOmegaSST(TurbulenceModel):
    model_states = ("k", "omega")

    def __init__(self, topo, option, wall_dist=None, bc_spec=None):
        super().__init__(topo, option, wall_dist)
        self.bc_spec_k = (bc_spec or {}).get("k", {})
        self.bc_spec_w = (bc_spec or {}).get("omega", {})

    # ------------------------------------------------------------------
    def _strain2(self, gradU):
        sym = 0.5 * (gradU + jnp.swapaxes(gradU, -1, -2))
        return 2.0 * jnp.maximum(jnp.sum(sym * sym, (-2, -1)), 1e-36)

    def _f1_f2(self, state, inputs, geom, grads):
        nu = self.nu(inputs)
        k = jnp.maximum(state["k"], 1e-16)
        w = jnp.maximum(state["omega"], 1e-16)
        d = jnp.maximum(self.wall_dist, 1e-12)
        gk, gw = grads
        cdkw = jnp.maximum(2.0 * SIGMA_W2 / w
                           * jnp.einsum("ci,ci->c", gk, gw), 1e-10)
        arg1 = jnp.minimum(
            jnp.maximum(jnp.sqrt(k) / (BETA_STAR * w * d),
                        500.0 * nu / (d ** 2 * w)),
            4.0 * SIGMA_W2 * k / (cdkw * d ** 2))
        f1 = jnp.tanh(jnp.minimum(arg1, 20.0) ** 4)
        arg2 = jnp.maximum(2.0 * jnp.sqrt(k) / (BETA_STAR * w * d),
                           500.0 * nu / (d ** 2 * w))
        f2 = jnp.tanh(jnp.minimum(arg2, 20.0) ** 2)
        return f1, f2, cdkw

    def nut_with_grad(self, state, inputs, geom, gradU):
        """SST strain-limited eddy viscosity (overrides the base hook used
        by divdevreff)."""
        k = jnp.maximum(state["k"], 1e-16)
        w = jnp.maximum(state["omega"], 1e-16)
        if gradU is None:
            return k / w
        S = jnp.sqrt(self._strain2(gradU))
        grads = self._grads(state, inputs, geom)
        _, f2, _ = self._f1_f2(state, inputs, geom, grads)
        return A1 * k / jnp.maximum(A1 * w, f2 * S)

    def nut(self, state, inputs, geom):
        # without gradU context use the simple k/omega form (bounded)
        k = jnp.maximum(state["k"], 1e-16)
        w = jnp.maximum(state["omega"], 1e-16)
        return k / w

    def _grads(self, state, inputs, geom):
        topo = self.topo
        bk = bc.coeffs(self.bc_spec_k, inputs["bc"].get("k", {}), topo,
                       geom, state["k"], rank=0)
        bw = bc.coeffs(self.bc_spec_w, inputs["bc"].get("omega", {}), topo,
                       geom, state["omega"], rank=0)
        k_b = bc.boundary_value(bk, state["k"], topo)
        w_b = bc.boundary_value(bw, state["omega"], topo)
        return (fvc.grad(geom, topo, state["k"], k_b),
                fvc.grad(geom, topo, state["omega"], w_b))

    # ------------------------------------------------------------------
    def _assemble(self, state, inputs, geom, phi, gradU):
        topo = self.topo
        nu = self.nu(inputs)
        k = state["k"]
        w = state["omega"]
        grads = self._grads(state, inputs, geom)
        f1, f2, cdkw = self._f1_f2(state, inputs, geom, grads)
        S2 = self._strain2(gradU)
        S = jnp.sqrt(S2)
        kpos = jnp.maximum(k, 1e-16)
        wpos = jnp.maximum(w, 1e-16)
        nut = A1 * kpos / jnp.maximum(A1 * wpos, f2 * S)

        bk = bc.coeffs(self.bc_spec_k, inputs["bc"].get("k", {}), topo,
                       geom, k, rank=0, phi_b=phi[topo.n_internal:])
        bw = bc.coeffs(self.bc_spec_w, inputs["bc"].get("omega", {}), topo,
                       geom, w, rank=0, phi_b=phi[topo.n_internal:])

        own_b = topo.owner[topo.n_internal:]
        sig_k = _blend(f1, SIGMA_K1, SIGMA_K2)
        sig_w = _blend(f1, SIGMA_W1, SIGMA_W2)
        dk = nu + sig_k * nut
        dw = nu + sig_w * nut
        dk_f = fvc.interpolate(geom, topo, dk, dk[own_b])
        dw_f = fvc.interpolate(geom, topo, dw, dw[own_b])

        Pk = jnp.minimum(nut * S2, 10.0 * BETA_STAR * kpos * wpos)
        gamma = _blend(f1, GAMMA1, GAMMA2)
        beta = _blend(f1, BETA1, BETA2)

        Mk = fvm.div(geom, topo, phi, k, bk, scheme="upwind", bounded=True) \
            - fvm.laplacian(geom, topo, dk_f, k, bk)
        Mk = Mk.add_source(Pk * geom.vol)
        Mk = Mk + fvm.Sp(geom, topo, BETA_STAR * wpos, k)  # implicit destr.

        Mw = fvm.div(geom, topo, phi, w, bw, scheme="upwind", bounded=True) \
            - fvm.laplacian(geom, topo, dw_f, w, bw)
        Pw = gamma * S2  # incompressible production (gamma*S^2 form)
        cross = (1.0 - f1) * cdkw
        Mw = Mw.add_source((Pw + cross) * geom.vol)
        Mw = Mw + fvm.Sp(geom, topo, beta * wpos, w)
        return Mk, Mw

    def pc_matrices(self, state, inputs, geom, phi, gradU):
        Mk, Mw = self._assemble(state, inputs, geom, phi, gradU)
        return {"k": (Mk, False), "omega": (Mw, False)}

    def residuals(self, state, inputs, geom, phi, gradU=None):
        Mk, Mw = self._assemble(state, inputs, geom, phi, gradU)
        return {"k": fvx.residual(Mk, state["k"], geom, self.topo),
                "omega": fvx.residual(Mw, state["omega"], geom, self.topo)}

    def correct(self, state, inputs, geom, phi, gradU=None,
                rel_tol=0.1, max_iters=100, relax=0.7, dt=None, old=None):
        from dafoam_tpu.ops import fvm as _fvm
        bounds = self.option["primalVarBounds"]
        Mk, Mw = self._assemble(state, inputs, geom, phi, gradU)
        if dt is not None:
            Mw = Mw + _fvm.ddt(geom, self.topo, state["omega"],
                               old["omega"], dt)
        Mw = fvx.relax(Mw, state["omega"], relax, self.topo)
        w_new, _ = fvsolve.solve(Mw, state["omega"], self.topo,
                                 symmetric=False, rel_tol=rel_tol,
                                 max_iters=max_iters)
        w_new = jnp.clip(w_new, bounds["omegaMin"], bounds["omegaMax"])
        st = dict(state, omega=w_new)
        Mk, _ = self._assemble(st, inputs, geom, phi, gradU)
        if dt is not None:
            Mk = Mk + _fvm.ddt(geom, self.topo, st["k"], old["k"], dt)
        Mk = fvx.relax(Mk, st["k"], relax, self.topo)
        k_new, _ = fvsolve.solve(Mk, st["k"], self.topo, symmetric=False,
                                 rel_tol=rel_tol, max_iters=max_iters)
        k_new = jnp.clip(k_new, bounds["kMin"], bounds["kMax"])
        return dict(st, k=k_new)
