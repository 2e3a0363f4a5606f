"""Differentiable turbulence-model family.

Re-designs the reference's DATurbulenceModel hierarchy
(src/adjoint/DAModel/DATurbulenceModel/DATurbulenceModel.H:165-186: pure
virtuals correctNut / correctModelStates / calcResiduals / correct) as pure
functions over the state pytree. Model states (nuTilda, k, omega, ...) are
ordinary adjoint states — the reference splices them into its flat state
vector via correctModelStates; here they are just extra keys.

Each model provides:
  nut(state, inputs, geom)        eddy viscosity from model states
  divdevreff(U, ...)              the momentum-equation stress term
                                  -div(nuEff grad U) - div(nuEff dev2(gradU^T))
  residuals(...)                  model transport residuals (for the adjoint)
  correct(...)                    one primal update of the model states
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx


class TurbulenceModel:
    model_states: tuple[str, ...] = ()

    def __init__(self, topo, option, wall_dist=None):
        self.topo = topo
        self.option = option
        self.wall_dist = wall_dist  # (nc,) frozen wall distance (meshWaveFrozen)

    # -- eddy viscosity ------------------------------------------------
    def nut(self, state, inputs, geom):
        raise NotImplementedError

    def nu(self, inputs):
        return inputs["params"]["nu"]

    def nu_eff_faces(self, state, inputs, geom, U_bco=None):
        """nu + nut interpolated to all faces."""
        nu = self.nu(inputs)
        nut = self.nut(state, inputs, geom)
        nu_eff = nut + nu
        nu_eff_b = self.nut_boundary(state, inputs, geom) + nu
        return fvc.interpolate(geom, self.topo, nu_eff, nu_eff_b), nu_eff, nu_eff_b

    def setup_wall_functions(self, full_bc_spec):
        """Enable Spalding wall functions on patches whose `nut` BC type is
        nutUSpaldingWallFunction (reference DAMisc
        nutUSpaldingWallFunctionDF)."""
        import numpy as np

        spec = full_bc_spec.get("nut", {})
        ni = self.topo.n_internal
        m = np.zeros((self.topo.n_faces - ni,))
        for p in self.topo.patches:
            if spec.get(p.name, {}).get("type") == "nutUSpaldingWallFunction":
                m[p.start - ni:p.start - ni + p.size] = 1.0
        self._wf_mask = m if m.any() else None

    def nut_boundary(self, state, inputs, geom):
        """Boundary nut: owner value off-wall; at walls zero (low-Re) or
        Spalding wall-function value where configured."""
        from dafoam_tpu.ops.core import boundary_gather
        ni = self.topo.n_internal
        nut = self.nut(state, inputs, geom)
        nut_b = boundary_gather(nut, self.topo)
        wall = self._wall_mask(geom.magsf.dtype)
        out = nut_b * (1.0 - wall)
        wf = getattr(self, "_wf_mask", None)
        if wf is not None and "U" in state:
            from dafoam_tpu.models.wallfunctions import spalding_nut_wall

            U = state["U"]
            nhat = geom.sf[ni:] / jnp.maximum(geom.magsf[ni:],
                                              1e-36)[:, None]
            Uo = boundary_gather(U, self.topo)
            Ut = Uo - jnp.einsum("fi,fi->f", Uo, nhat)[:, None] * nhat
            mag_ut = jnp.sqrt(jnp.maximum(jnp.sum(Ut * Ut, -1), 1e-36))
            y = 1.0 / jnp.maximum(geom.nonorth_dc[ni:], 1e-36)
            nut_wf = spalding_nut_wall(mag_ut, y, self.nu(inputs))
            out = jnp.where(jnp.asarray(wf, out.dtype) > 0.5, nut_wf, out)
        return out

    def _wall_mask(self, dtype):
        import numpy as np

        ni = self.topo.n_internal
        m = np.zeros((self.topo.n_faces - ni,))
        for p in self.topo.patches:
            if p.kind == "wall":
                m[p.start - ni:p.start - ni + p.size] = 1.0
        return jnp.asarray(m, dtype)

    # -- momentum stress term -----------------------------------------
    def nut_with_grad(self, state, inputs, geom, gradU):
        """nut given the velocity gradient (SST's strain-limited form
        overrides this; default ignores gradU)."""
        return self.nut(state, inputs, geom)

    def divdevreff(self, U, state, inputs, geom, U_bco) -> fvx.FvMatrix:
        """-laplacian(nuEff, U) - div(nuEff dev2(T(grad U))) as an FvMatrix
        (implicit laplacian + explicit transpose/deviatoric part), matching
        the role of daTurb_->divDevReff(U) in DAResidualSimpleFoam.C:145."""
        topo = self.topo
        U_b = bc.boundary_value(U_bco, U, topo)
        gradU = fvc.grad(geom, topo, U, U_b)           # (nc,3,3) d_i U_j
        nu = self.nu(inputs)
        nu_eff = self.nut_with_grad(state, inputs, geom, gradU) + nu
        nu_eff_b = self.nut_boundary(state, inputs, geom) + nu
        nu_eff_f = fvc.interpolate(geom, topo, nu_eff, nu_eff_b)
        M = -fvm.laplacian(geom, topo, nu_eff_f, U, U_bco, grad_psi=gradU)
        # explicit: -div( nuEff * dev2(gradU^T) )
        from dafoam_tpu.ops.core import boundary_gather
        ni = topo.n_internal
        # boundary gradient: replace normal component with BC snGrad
        sng_b = bc.boundary_sngrad(U_bco, U, topo)      # (nb,3)
        nhat = geom.sf[ni:] / jnp.maximum(geom.magsf[ni:], 1e-36)[:, None]
        gU_own = boundary_gather(gradU, topo)
        gU_b = gU_own + nhat[:, :, None] * (
            sng_b - jnp.einsum("fi,fij->fj", nhat, gU_own))[:, None, :]

        def dev2T(g):
            # dev2(A) = A - (2/3) tr(A) I, applied to A = gradU^T
            gt = jnp.swapaxes(g, -1, -2)
            tr = jnp.trace(g, axis1=-2, axis2=-1)
            eye = jnp.eye(3, dtype=g.dtype)
            return gt - (2.0 / 3.0) * tr[..., None, None] * eye

        T_cell = nu_eff[:, None, None] * dev2T(gradU)
        T_b = nu_eff_b[:, None, None] * dev2T(gU_b)
        expl = fvc.div_tensor(geom, topo, T_cell, T_b)  # (nc,3) per-volume
        # contribution must be -expl: add +expl*V to source
        return M.add_source(expl * geom.vol[:, None])

    # -- model transport ----------------------------------------------
    def residuals(self, state, inputs, geom, phi) -> dict:
        return {}

    def pc_matrices(self, state, inputs, geom, phi, gradU) -> dict:
        """{state_name: (FvMatrix, symmetric)} for the adjoint block PC."""
        return {}

    def correct(self, state, inputs, geom, phi, rel_tol=0.1, max_iters=100):
        """One primal iteration of the model equations; returns new state."""
        return state


class Laminar(TurbulenceModel):
    """No model states; nut = 0 (reference DADummyTurbulenceModel role for
    laminar flows)."""

    def nut(self, state, inputs, geom):
        return jnp.zeros_like(geom.vol)

    def nut_boundary(self, state, inputs, geom):
        return jnp.zeros((self.topo.n_boundary,), geom.vol.dtype)
