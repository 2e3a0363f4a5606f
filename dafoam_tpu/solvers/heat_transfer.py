"""Solid heat-conduction solver (variable conductivity + volumetric sources).

Capability parity with the reference's DAHeatTransferFoam
(src/adjoint/DASolver/DAHeatTransferFoam/): steady laplacian(kappa, T) with
an optional heat source == 0. Supports a per-cell kappa field as a
differentiable input (the reference's variable-kappa test
tests/runUnitTests_DAHeatTransferFoamVariableKappa.py), making this the
topology-optimization-ready thermal solver.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import DASolverBase, PrimalInfo
from dafoam_tpu.states import StateInfo


class DAHeatTransferFoam(DASolverBase):
    state_info = StateInfo(vol_scalar=("T",))

    def __init__(self, option, topo, points):
        # optional P1 radiation (reference DARadiationModel/DAP1): adds the
        # incident-radiation field G as a state and couples a G - 4 a sigma
        # T^4 into the energy balance
        bcs = (option.get("boundaryConditions", {})
               if isinstance(option, dict) else option["boundaryConditions"])
        self.has_radiation = "G" in bcs
        if self.has_radiation:
            self.state_info = StateInfo(vol_scalar=("T", "G"))
        super().__init__(option, topo, points)

    SIGMA_SB = 5.670374419e-8

    def _rad_props(self, inputs):
        p = inputs["params"]
        a = p.get("radiationAbsorptivity", 0.5)
        sig_s = p.get("radiationScatter", 0.0)
        e = p.get("radiationEmissivity", a)
        return a, sig_s, e

    def _assemble_G(self, state, inputs, geom):
        from dafoam_tpu.ops import fvm as _fvm
        a, sig_s, e = self._rad_props(inputs)
        G, T = state["G"], state["T"]
        bco = bc.coeffs(self.bc_spec["G"], inputs["bc"].get("G", {}),
                        self.topo, geom, G, rank=0)
        gamma = 1.0 / jnp.maximum(3.0 * (a + sig_s), 1e-12)
        gamma_f = jnp.full((self.topo.n_faces,), gamma, self.dtype)
        M = -_fvm.laplacian(geom, self.topo, gamma_f, G, bco) \
            + _fvm.Sp(geom, self.topo, jnp.full_like(G, a), G)
        M = M.add_source(4.0 * e * self.SIGMA_SB * T ** 4 * geom.vol)
        return M

    def _radiative_heat(self, state, inputs, geom):
        a, sig_s, e = self._rad_props(inputs)
        return a * state["G"] - 4.0 * e * self.SIGMA_SB * state["T"] ** 4

    def _assemble(self, T, inputs, geom, state=None):
        bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                        self.topo, geom, T, rank=0)
        kappa = inputs["params"]["kappa"]
        if jnp.ndim(kappa) == 0:
            gamma_f = jnp.full((self.topo.n_faces,), kappa, self.dtype)
        else:
            kappa_b = kappa[self.topo.owner[self.topo.n_internal:]]
            gamma_f = fvc.interpolate(geom, self.topo, kappa, kappa_b)
        M = -fvm.laplacian(geom, self.topo, gamma_f, T, bco)
        q = inputs["params"].get("heatSource")
        if q is not None:
            M = M.add_source(jnp.broadcast_to(q, geom.vol.shape) * geom.vol)
        if self.option.get("fvSource"):
            from dafoam_tpu.fvsource import compute_heat_source
            qs = compute_heat_source(self.option, inputs, geom, self.dtype)
            if qs is not None:
                M = M.add_source(qs * geom.vol)
        if self.has_radiation and state is not None:
            M = M.add_source(self._radiative_heat(
                dict(state, T=T), inputs, geom) * geom.vol)
        return M

    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        M = self._assemble(state["T"], inputs, geom, state=state)
        out = {"T": fvx.residual(M, state["T"], geom, self.topo)}
        if self.has_radiation:
            MG = self._assemble_G(state, inputs, geom)
            out["G"] = fvx.residual(MG, state["G"], geom, self.topo)
        return out

    def solve_primal(self, state, inputs):
        import jax

        geom = self.geometry(inputs)
        tol = self.option["primalMinResTol"]

        def res_of(st):
            r = self.residuals(st, inputs)
            return jnp.max(jnp.asarray([jnp.max(jnp.abs(v))
                                        for v in r.values()]))

        def cond(c):
            st, it, res = c
            return jnp.logical_and(it < 100, res > tol)

        def body(c):
            st, it, res = c
            Mi = self._assemble(st["T"], inputs, geom, state=st)
            Tn, _ = fvsolve.solve(Mi, st["T"], self.topo, symmetric=True,
                                  rel_tol=1e-14, max_iters=10000)
            # under-relax T when radiation couples T^4 back into the source
            alpha = 0.7 if self.has_radiation else 1.0
            st = dict(st, T=st["T"] + alpha * (Tn - st["T"]))
            if self.has_radiation:
                MG = self._assemble_G(st, inputs, geom)
                Gn, _ = fvsolve.solve(MG, st["G"], self.topo,
                                      symmetric=False, rel_tol=1e-12,
                                      max_iters=2000)
                st = dict(st, G=Gn)
            return st, it + 1, res_of(st)

        st, it, res = jax.lax.while_loop(
            cond, body, (state, jnp.asarray(0),
                         jnp.asarray(jnp.inf, self.dtype)))
        return st, PrimalInfo(it, res, res <= tol,
                              jnp.logical_not(self.states_valid(st)))

    def boundary_fields(self, state, inputs, geom):
        bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                        self.topo, geom, state["T"], rank=0)
        return {"T": bc.boundary_value(bco, state["T"], self.topo)}

    def aux_fields(self, state, inputs, geom):
        out = {}
        k = inputs["params"].get("kappa")
        if k is not None and jnp.ndim(k) > 0:
            out["kappa"] = k
        return out

    def thermal_conductance(self, state, inputs, geom):
        """(nb,) conductivity at boundary-face owners — the kappa part of
        the CHT protocol (reference DAOutputThermalCoupling.C:94-149)."""
        import jax.numpy as jnp
        k = inputs["params"]["kappa"]
        own_b = self.topo.owner[self.topo.n_internal:]
        if jnp.ndim(k) == 0:
            return jnp.full((self.topo.n_boundary,), k, self.dtype)
        return k[own_b]
