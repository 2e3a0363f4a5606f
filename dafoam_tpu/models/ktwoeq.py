"""Standard k-epsilon and Wilcox k-omega models (differentiable, low-Re
variants without wall damping; use wall functions for high-Re runs).

Capability parity with the reference's DAkEpsilon (768 LoC) and DAkOmega
(769 LoC) (src/adjoint/DAModel/DATurbulenceModel/): two model states each,
transport residuals in R(W), semi-implicit destruction for the primal.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.models.base import TurbulenceModel
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx


def _strain2(gradU):
    sym = 0.5 * (gradU + jnp.swapaxes(gradU, -1, -2))
    return 2.0 * jnp.maximum(jnp.sum(sym * sym, (-2, -1)), 1e-36)


class _TwoEq(TurbulenceModel):
    def __init__(self, topo, option, wall_dist=None, bc_spec=None):
        super().__init__(topo, option, wall_dist)
        spec = bc_spec or {}
        self.bc_specs = {n: spec.get(n, {}) for n in self.model_states}

    def _bco(self, name, state, inputs, geom, phi):
        return bc.coeffs(self.bc_specs[name], inputs["bc"].get(name, {}),
                         self.topo, geom, state[name], rank=0,
                         phi_b=phi[self.topo.n_internal:])

    def _transport(self, name, state, inputs, geom, phi, gamma, src_expl,
                   sp_coef):
        """div(phi, q) - laplacian(gamma, q) == src_expl - Sp(sp_coef, q)"""
        topo = self.topo
        q = state[name]
        bco = self._bco(name, state, inputs, geom, phi)
        g_b = gamma[topo.owner[topo.n_internal:]]
        g_f = fvc.interpolate(geom, topo, gamma, g_b)
        M = fvm.div(geom, topo, phi, q, bco, scheme="upwind", bounded=True) \
            - fvm.laplacian(geom, topo, g_f, q, bco)
        M = M.add_source(src_expl * geom.vol)
        M = M + fvm.Sp(geom, topo, sp_coef, q)
        return M

    def _solve_one(self, name, M, state, relax, rel_tol, max_iters, lo, hi):
        M = fvx.relax(M, state[name], relax, self.topo)
        sol, _ = fvsolve.solve(M, state[name], self.topo, symmetric=False,
                               rel_tol=rel_tol, max_iters=max_iters)
        return jnp.clip(sol, lo, hi)


class KEpsilon(_TwoEq):
    model_states = ("k", "epsilon")
    CMU, C1, C2, SK, SE = 0.09, 1.44, 1.92, 1.0, 1.3

    def nut(self, state, inputs, geom):
        k = jnp.maximum(state["k"], 1e-16)
        e = jnp.maximum(state["epsilon"], 1e-16)
        return self.CMU * k * k / e

    def _mats(self, state, inputs, geom, phi, gradU):
        nu = self.nu(inputs)
        k = jnp.maximum(state["k"], 1e-16)
        e = jnp.maximum(state["epsilon"], 1e-16)
        nut = self.nut(state, inputs, geom)
        G = nut * _strain2(gradU)
        Mk = self._transport("k", state, inputs, geom, phi,
                             nu + nut / self.SK, G, e / k)
        Me = self._transport("epsilon", state, inputs, geom, phi,
                             nu + nut / self.SE, self.C1 * G * e / k,
                             self.C2 * e / k)
        return Mk, Me

    def pc_matrices(self, state, inputs, geom, phi, gradU):
        Mk, Me = self._mats(state, inputs, geom, phi, gradU)
        return {"k": (Mk, False), "epsilon": (Me, False)}

    def residuals(self, state, inputs, geom, phi, gradU=None):
        Mk, Me = self._mats(state, inputs, geom, phi, gradU)
        return {"k": fvx.residual(Mk, state["k"], geom, self.topo),
                "epsilon": fvx.residual(Me, state["epsilon"], geom,
                                        self.topo)}

    def correct(self, state, inputs, geom, phi, gradU=None, rel_tol=0.1,
                max_iters=100, relax=0.7, dt=None, old=None):
        from dafoam_tpu.ops import fvm as _fvm
        b = self.option["primalVarBounds"]
        Mk, Me = self._mats(state, inputs, geom, phi, gradU)
        if dt is not None:
            Me = Me + _fvm.ddt(geom, self.topo, state["epsilon"],
                               old["epsilon"], dt)
        e = self._solve_one("epsilon", Me, state, relax, rel_tol, max_iters,
                            b["epsilonMin"], b["epsilonMax"])
        st = dict(state, epsilon=e)
        Mk, _ = self._mats(st, inputs, geom, phi, gradU)
        if dt is not None:
            Mk = Mk + _fvm.ddt(geom, self.topo, st["k"], old["k"], dt)
        kk = self._solve_one("k", Mk, st, relax, rel_tol, max_iters,
                             b["kMin"], b["kMax"])
        return dict(st, k=kk)


class KOmega(_TwoEq):
    model_states = ("k", "omega")
    BSTAR, ALPHA, BETA, SK, SW = 0.09, 5.0 / 9.0, 3.0 / 40.0, 0.5, 0.5

    def nut(self, state, inputs, geom):
        k = jnp.maximum(state["k"], 1e-16)
        w = jnp.maximum(state["omega"], 1e-16)
        return k / w

    def _mats(self, state, inputs, geom, phi, gradU):
        nu = self.nu(inputs)
        k = jnp.maximum(state["k"], 1e-16)
        w = jnp.maximum(state["omega"], 1e-16)
        nut = k / w
        G = nut * _strain2(gradU)
        Mk = self._transport("k", state, inputs, geom, phi,
                             nu + self.SK * nut, G, self.BSTAR * w)
        Mw = self._transport("omega", state, inputs, geom, phi,
                             nu + self.SW * nut,
                             self.ALPHA * w / k * G, self.BETA * w)
        return Mk, Mw

    def pc_matrices(self, state, inputs, geom, phi, gradU):
        Mk, Mw = self._mats(state, inputs, geom, phi, gradU)
        return {"k": (Mk, False), "omega": (Mw, False)}

    def residuals(self, state, inputs, geom, phi, gradU=None):
        Mk, Mw = self._mats(state, inputs, geom, phi, gradU)
        return {"k": fvx.residual(Mk, state["k"], geom, self.topo),
                "omega": fvx.residual(Mw, state["omega"], geom, self.topo)}

    def correct(self, state, inputs, geom, phi, gradU=None, rel_tol=0.1,
                max_iters=100, relax=0.7, dt=None, old=None):
        from dafoam_tpu.ops import fvm as _fvm
        b = self.option["primalVarBounds"]
        Mk, Mw = self._mats(state, inputs, geom, phi, gradU)
        if dt is not None:
            Mw = Mw + _fvm.ddt(geom, self.topo, state["omega"],
                               old["omega"], dt)
        w = self._solve_one("omega", Mw, state, relax, rel_tol, max_iters,
                            b["omegaMin"], b["omegaMax"])
        st = dict(state, omega=w)
        Mk, _ = self._mats(st, inputs, geom, phi, gradU)
        if dt is not None:
            Mk = Mk + _fvm.ddt(geom, self.topo, st["k"], old["k"], dt)
        kk = self._solve_one("k", Mk, st, relax, rel_tol, max_iters,
                             b["kMin"], b["kMax"])
        return dict(st, k=kk)
