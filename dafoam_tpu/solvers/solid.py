"""Linear-elasticity solid solver (displacement formulation).

Capability parity with the reference's DASolidDisplacementFoam
(src/adjoint/DASolver/DASolidDisplacementFoam/): steady div(sigma)=0 with
sigma = mu (grad D + grad D^T) + lambda tr(grad D) I, segregated OpenFOAM
form: implicit laplacian(2 mu + lambda, D) + explicit remainder
(divSigmaExp). Used for aerostructural (FSI) coupling and the
vonMisesStressKS constraint (reference DAFunctionVonMisesStressKS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import DASolverBase, PrimalInfo
from dafoam_tpu.states import StateInfo


def _sigma(gradD, mu, lam):
    gt = jnp.swapaxes(gradD, -1, -2)
    tr = jnp.trace(gradD, axis1=-2, axis2=-1)
    eye = jnp.eye(3, dtype=gradD.dtype)
    return mu * (gradD + gt) + lam * tr[..., None, None] * eye


def von_mises(sigma):
    s_dev = sigma - jnp.trace(sigma, axis1=-2, axis2=-1)[..., None, None] \
        * jnp.eye(3, dtype=sigma.dtype) / 3.0
    return jnp.sqrt(jnp.maximum(1.5 * jnp.sum(s_dev * s_dev, (-2, -1)),
                                1e-36))


class DASolidDisplacementFoam(DASolverBase):
    state_info = StateInfo(vol_vector=("D",))

    def _props(self, inputs):
        p = inputs["params"]
        E = p.get("E", 2e11)
        nu_p = p.get("nuPoisson", 0.3)
        rho = p.get("rhoSolid", 7854.0)
        mu = E / (2.0 * (1.0 + nu_p))
        lam = nu_p * E / ((1.0 + nu_p) * (1.0 - 2.0 * nu_p))
        # plane stress correction (OpenFOAM planeStress option)
        if self.option.get("solidProperties", {}).get("planeStress", False):
            lam = nu_p * E / ((1.0 + nu_p) * (1.0 - nu_p))
        return mu / rho * rho, lam, rho  # keep dimensional (not /rho): steady

    def _assemble(self, D, inputs, geom):
        topo = self.topo
        mu, lam, rho = self._props(inputs)
        bco = bc.coeffs(self.bc_spec["D"], inputs["bc"].get("D", {}),
                        topo, geom, D, rank=1)
        c = 2.0 * mu + lam
        gamma_f = jnp.full((topo.n_faces,), c, self.dtype)
        M = -fvm.laplacian(geom, topo, gamma_f, D, bco)
        # explicit: div( mu gradD^T + lam tr I - (mu + lam) gradD )
        D_b = bc.boundary_value(bco, D, topo)
        gradD = fvc.grad(geom, topo, D, D_b)
        T_cell = mu * jnp.swapaxes(gradD, -1, -2) \
            + lam * jnp.trace(gradD, axis1=-2, axis2=-1)[..., None, None] \
            * jnp.eye(3, dtype=D.dtype) - (mu + lam) * gradD
        own_b = topo.owner[topo.n_internal:]
        T_b = T_cell[own_b]
        expl = fvc.div_tensor(geom, topo, T_cell, T_b)
        # equation: -lap(c, D) - divSigmaExp = body force (none)
        M = M.add_source(expl * geom.vol[:, None])
        q = inputs["params"].get("bodyForce")
        if q is not None:
            M = M.add_source(jnp.broadcast_to(jnp.asarray(q, self.dtype),
                                              (topo.n_cells, 3))
                             * geom.vol[:, None])
        return M

    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        M = self._assemble(state["D"], inputs, geom)
        return {"D": fvx.residual(M, state["D"], geom, self.topo)}

    def solve_primal(self, state, inputs):
        geom = self.geometry(inputs)
        tol = self.option["primalMinResTol"]
        # residuals are huge dimensional numbers (E ~ 1e11): use relative
        mu, lam, _ = self._props(inputs)
        scale = 2.0 * mu + lam

        def res_of(D):
            Mi = self._assemble(D, inputs, geom)
            return jnp.max(jnp.abs(fvx.residual(Mi, D, geom, self.topo))) \
                / scale

        def cond(c):
            D, it, res = c
            return jnp.logical_and(it < self.option["primalMaxIters"],
                                   res > tol)

        def body(c):
            D, it, res = c
            Mi = self._assemble(D, inputs, geom)
            Dn, _ = fvsolve.solve(Mi, D, self.topo, symmetric=False,
                                  rel_tol=1e-12, max_iters=2000)
            # under-relax the Picard update for the explicit coupling
            alpha = self.option["relaxationFactors"]["fields"].get("D", 0.9)
            Dn = D + alpha * (Dn - D)
            return Dn, it + 1, res_of(Dn)

        D, it, res = jax.lax.while_loop(
            cond, body, (state["D"], jnp.asarray(0),
                         jnp.asarray(jnp.inf, self.dtype)))
        state = dict(state, D=D)
        ok = self.states_valid(state)
        return state, PrimalInfo(it, res, jnp.logical_and(res <= tol, ok),
                                 jnp.logical_not(ok))

    def aux_fields(self, state, inputs, geom):
        mu, lam, rho = self._props(inputs)
        bco = bc.coeffs(self.bc_spec["D"], inputs["bc"].get("D", {}),
                        self.topo, geom, state["D"], rank=1)
        D_b = bc.boundary_value(bco, state["D"], self.topo)
        gradD = fvc.grad(geom, self.topo, state["D"], D_b)
        sig = _sigma(gradD, mu, lam)
        return {"vonMises": von_mises(sig), "sigma": sig}

    def boundary_fields(self, state, inputs, geom):
        bco = bc.coeffs(self.bc_spec["D"], inputs["bc"].get("D", {}),
                        self.topo, geom, state["D"], rank=1)
        return {"D": bc.boundary_value(bco, state["D"], self.topo)}
