"""Conjugate heat transfer (aerothermal) coupling.

Re-designs the reference's CHT path (SURVEY.md §2.5 coupling protocol;
MPhys components DAFoamThermal/DAFoamFaceCoords, mphys_dafoam.py:862/954;
runRegTests_AeroThermal.py): each side exposes (T_nearwall, kappa/d) on
the coupling faces; the receiving side applies a mixed/Robin BC with
valueFraction = K_nei / (K_my + K_nei).

TPU-native twist: instead of OpenMDAO's coupled-adjoint machinery, the two
single-discipline solvers are composed into ONE residual over the union
state {fluid: W_f, solid: W_s} with the exchange computed in-line — so the
COUPLED adjoint is the same jax.vjp + FGMRES code path as single-physics,
coupling Jacobian blocks included exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.adjoint import solver as adjsolver
from dafoam_tpu.linalg.krylov import gmres


class CHTCoupling:
    def __init__(self, fluid, solid, fluid_patch: str, solid_patch: str):
        """fluid: DASimpleFoam with T enabled; solid: DAHeatTransferFoam.
        The two patches must be geometrically coincident with faces in
        MATCHING ORDER (generate meshes accordingly or permute)."""
        self.fluid = fluid
        self.solid = solid
        self.fp = fluid_patch
        self.sp = solid_patch
        nf = fluid.topo.patch(fluid_patch).size
        ns = solid.topo.patch(solid_patch).size
        assert nf == ns, (nf, ns)

    # -- exchange data ----------------------------------------------------
    def _side_data(self, solver, state, inputs, patch):
        topo = solver.topo
        ni = topo.n_internal
        sl = topo.patch_bslice(patch)
        own = topo.owner[ni:][sl]
        geom = solver.geometry(inputs)
        T_near = state["T"][own]
        kappa = solver.thermal_conductance(state, inputs, geom)[sl]
        dc = geom.nonorth_dc[ni:][sl]
        return T_near, kappa * dc  # (T, K=kappa/d)

    def _apply_coupling(self, inputs_f, inputs_s, state_f, state_s):
        """Compute mixed-BC values for both sides from the other side."""
        Tf, Kf = self._side_data(self.fluid, state_f, inputs_f, self.fp)
        Ts, Ks = self._side_data(self.solid, state_s, inputs_s, self.sp)
        # fluid receives solid data
        vf_f = Ks / (Kf + Ks)
        bc_f = {"refValue": Ts, "refGrad": jnp.zeros_like(Ts),
                "valueFraction": vf_f}
        vf_s = Kf / (Kf + Ks)
        bc_s = {"refValue": Tf, "refGrad": jnp.zeros_like(Tf),
                "valueFraction": vf_s}
        inf = dict(inputs_f)
        inf["bc"] = {k: dict(v) for k, v in inputs_f["bc"].items()}
        inf["bc"].setdefault("T", {})[self.fp] = bc_f
        ins = dict(inputs_s)
        ins["bc"] = {k: dict(v) for k, v in inputs_s["bc"].items()}
        ins["bc"].setdefault("T", {})[self.sp] = bc_s
        return inf, ins

    # -- coupled primal (block Gauss-Seidel) --------------------------------
    def solve_primal(self, state_f, state_s, inputs_f, inputs_s,
                     n_outer=20):
        for it in range(n_outer):
            inf, ins = self._apply_coupling(inputs_f, inputs_s, state_f,
                                            state_s)
            state_f, info_f = self.fluid.run_primal(state_f, inf)
            state_s, info_s = self.solid.run_primal(state_s, ins)
        return state_f, state_s, (info_f, info_s)

    # -- coupled residual over the union state -------------------------------
    def residuals(self, W, inputs_f, inputs_s):
        inf, ins = self._apply_coupling(inputs_f, inputs_s, W["fluid"],
                                        W["solid"])
        rf = self.fluid._norm_residuals(W["fluid"], inf)
        rs = self.solid._norm_residuals(W["solid"], ins)
        return {"fluid": rf, "solid": rs}

    def interface_mismatch(self, state_f, state_s, inputs_f, inputs_s):
        """Diagnostics: interface temperature/flux continuity."""
        inf, ins = self._apply_coupling(inputs_f, inputs_s, state_f, state_s)
        bf_T = self.fluid.boundary_fields(state_f, inf,
                                          self.fluid.geometry(inf))["T"]
        bs_T = self.solid.boundary_fields(state_s, ins,
                                          self.solid.geometry(ins))["T"]
        Tf_b = bf_T[self.fluid.topo.patch_bslice(self.fp)]
        Ts_b = bs_T[self.solid.topo.patch_bslice(self.sp)]
        return jnp.max(jnp.abs(Tf_b - Ts_b))

    # -- coupled adjoint -----------------------------------------------------
    def solve_adjoint(self, state_f, state_s, inputs_f, inputs_s,
                      func_side: str, func_name: str,
                      restart=200, rel_tol=1e-9, max_iters=3000):
        """Total derivatives of one side's function w.r.t. BOTH sides'
        inputs through the coupled system."""
        W = {"fluid": state_f, "solid": state_s}

        def Jfun(W, inputs_f, inputs_s):
            inf, ins = self._apply_coupling(inputs_f, inputs_s, W["fluid"],
                                            W["solid"])
            if func_side == "fluid":
                return self.fluid.eval_function(func_name, W["fluid"], inf)
            return self.solid.eval_function(func_name, W["solid"], ins)

        dJdW = jax.grad(lambda w: Jfun(w, inputs_f, inputs_s))(W)

        geom_f = self.fluid.geometry(inputs_f)
        geom_s = self.solid.geometry(inputs_s)
        scales = {"fluid": self.fluid.state_scales(geom_f),
                  "solid": self.solid.state_scales(geom_s)}

        def scale_tree(t, invert=False):
            return {side: {k: (v / scales[side].get(k, 1.0) if invert
                               else v * scales[side].get(k, 1.0))
                           for k, v in sub.items()}
                    for side, sub in t.items()}

        _, f_vjp = jax.vjp(
            lambda w: self.residuals(w, inputs_f, inputs_s), W)

        def matT(ps):
            p = scale_tree(ps, invert=True)
            (g,) = f_vjp(p)
            return scale_tree(g)

        psi_s, info = gmres(matT, scale_tree(dJdW), restart=restart,
                            rel_tol=rel_tol, max_iters=max_iters)
        psi = scale_tree(psi_s, invert=True)

        # totals wrt both inputs trees
        _, fx_vjp = jax.vjp(
            lambda xf, xs: Jfun(W, xf, xs), inputs_f, inputs_s)
        dJf, dJs = fx_vjp(jnp.asarray(1.0, geom_f.vol.dtype))
        _, rx_vjp = jax.vjp(
            lambda xf, xs: self.residuals(W, xf, xs), inputs_f, inputs_s)
        dRf, dRs = rx_vjp(psi)
        sub = jax.tree_util.tree_map
        return (sub(lambda a, b: a - b, dJf, dRf),
                sub(lambda a, b: a - b, dJs, dRs), info)
