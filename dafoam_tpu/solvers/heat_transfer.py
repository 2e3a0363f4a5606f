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

    def _assemble(self, T, inputs, geom):
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
        return M

    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        M = self._assemble(state["T"], inputs, geom)
        return {"T": fvx.residual(M, state["T"], geom, self.topo)}

    def solve_primal(self, state, inputs):
        import jax

        geom = self.geometry(inputs)
        tol = self.option["primalMinResTol"]

        def res_of(T):
            Mi = self._assemble(T, inputs, geom)
            return jnp.max(jnp.abs(fvx.residual(Mi, T, geom, self.topo)))

        def cond(c):
            T, it, res = c
            return jnp.logical_and(it < 50, res > tol)

        def body(c):
            T, it, res = c
            Mi = self._assemble(T, inputs, geom)
            Tn, _ = fvsolve.solve(Mi, T, self.topo, symmetric=True,
                                  rel_tol=1e-14, max_iters=10000)
            return Tn, it + 1, res_of(Tn)

        sol, it, res = jax.lax.while_loop(
            cond, body, (state["T"], jnp.asarray(0),
                         jnp.asarray(jnp.inf, self.dtype)))
        state = dict(state, T=sol)
        return state, PrimalInfo(it, res, res <= tol,
                                 jnp.logical_not(self.states_valid(state)))

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
