"""Passive-scalar convection–diffusion solver.

Capability parity with the reference's DAScalarTransportFoam
(src/adjoint/DASolver/DAScalarTransportFoam/, residual
DAResidualScalarTransportFoam.C:57-84: TEqn = ddt(T) + div(phi,T)
- laplacian(DT,T)), the simplest registered solver and the first
end-to-end slice of the build plan (SURVEY.md §7 step 3).

The velocity/flux field is a frozen input (not a state); T is the only
adjoint state. Steady mode drops the ddt term and, since the equation is
then linear in T, the primal is one Krylov solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import DASolverBase, PrimalInfo
from dafoam_tpu.states import StateInfo


class DAScalarTransportFoam(DASolverBase):
    state_info = StateInfo(vol_scalar=("T",))

    def __init__(self, option, topo, points):
        super().__init__(option, topo, points)
        self.div_scheme = self.option["divSchemes"].get("div(phi,T)", "upwind")
        self.steady = self.option["ddtScheme"] == "steadyState"

    # -- flux from the frozen convecting velocity ----------------------
    def _phi(self, inputs, geom):
        U = inputs["params"]["U"]          # (nc,3) frozen convecting field
        Ub = bc.coeffs(self.bc_spec.get("U", {}), inputs["bc"].get("U", {}),
                       self.topo, geom, U, rank=1)
        U_b = bc.boundary_value(Ub, U, self.topo)
        return fvc.flux(geom, topo := self.topo, U, U_b)

    def _assemble(self, T, inputs, geom, phi):
        bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                        self.topo, geom, T, rank=0,
                        phi_b=phi[self.topo.n_internal:])
        DT = inputs["params"]["DT"]
        gamma_f = jnp.full((self.topo.n_faces,), DT, self.dtype)
        M = fvm.div(geom, self.topo, phi, T, bco, scheme=self.div_scheme) \
            - fvm.laplacian(geom, self.topo, gamma_f, T, bco)
        return M

    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        phi = self._phi(inputs, geom)
        T = state["T"]
        M = self._assemble(T, inputs, geom, phi)
        r = fvx.residual(M, T, geom, self.topo)
        if not self.steady:
            dt = self.option["deltaT"]
            r = r + (T - inputs["T_old"]) / dt
        return {"T": r}

    def solve_primal(self, state, inputs):
        geom = self.geometry(inputs)
        phi = self._phi(inputs, geom)
        T = state["T"]
        M = self._assemble(T, inputs, geom, phi)
        if self.steady:
            # linear except for the deferred non-orthogonal correction:
            # Picard-iterate (assemble at current T, solve, repeat) until the
            # freshly-assembled residual meets primalMinResTol.
            tol = self.option["primalMinResTol"]

            def res_of(T):
                Mi = self._assemble(T, inputs, geom, phi)
                return jnp.max(jnp.abs(fvx.residual(Mi, T, geom, self.topo)))

            def cond(c):
                T, it, res = c
                return jnp.logical_and(it < 50, res > tol)

            def body(c):
                T, it, res = c
                Mi = self._assemble(T, inputs, geom, phi)
                Tn, _ = fvsolve.solve(Mi, T, self.topo, symmetric=False,
                                      rel_tol=1e-14, max_iters=5000)
                return Tn, it + 1, res_of(Tn)

            sol, it, res = jax.lax.while_loop(
                cond, body, (T, jnp.asarray(0),
                             jnp.asarray(jnp.inf, self.dtype)))
            state = dict(state, T=sol)
            return state, PrimalInfo(it, res, res <= tol,
                                     jnp.logical_not(self.states_valid(state)))
        # unsteady: implicit Euler steps via lax.scan
        dt = self.option["deltaT"]
        n_steps = int(round(self.option["endTime"] / dt))

        def step(T, _):
            Mdt = self._assemble(T, inputs, geom, phi)
            v = geom.vol
            Mdt = Mdt._replace(diag=Mdt.diag + v / dt,
                               source=Mdt.source + v / dt * T)
            Tn, info = fvsolve.solve(Mdt, T, self.topo, symmetric=False,
                                     rel_tol=1e-12, max_iters=1000)
            return Tn, Tn

        Tend, hist = jax.lax.scan(step, T, None, length=n_steps)
        state = dict(state, T=Tend)
        return state, PrimalInfo(jnp.asarray(n_steps), jnp.asarray(0.0),
                                 jnp.asarray(True),
                                 jnp.logical_not(self.states_valid(state)))

    def boundary_fields(self, state, inputs, geom):
        phi = self._phi(inputs, geom)
        bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                        self.topo, geom, state["T"], rank=0,
                        phi_b=phi[self.topo.n_internal:])
        return {"T": bc.boundary_value(bco, state["T"], self.topo)}

    def function_ctx(self, state, inputs, with_residuals=False):
        ctx = super().function_ctx(state, inputs, with_residuals)
        geom = ctx["geom"]
        ctx["phi"] = self._phi(inputs, geom)
        return ctx
