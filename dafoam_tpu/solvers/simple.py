"""Steady incompressible SIMPLE solver with turbulence — the north-star.

Capability parity with the reference's DASimpleFoam
(src/adjoint/DASolver/DASimpleFoam/: UEqnSimple.H momentum predictor,
pEqnSimple.H pressure-projection; residual definition
DAResidualSimpleFoam.C:106-237). Parity-critical semantics preserved
(SURVEY.md §2.5):

- R_U = (UEqn & U) + grad(p) with UEqn = div(phi,U) + divDevReff(U) [- fvSource],
  after UEqn.relax() — relaxation's source compensation cancels analytically
  but its diagonal manipulation feeds rAU and hence R_p/R_phi;
- R_p = pEqn & p with pEqn = laplacian(rAU,p) == div(phiHbyA), built from
  rAU = 1/A(UEqn), HbyA = rAU*H(UEqn), optional constrainHbyA
  (useConstrainHbyA option — constraining "creates discontinuity" that
  degrades derivatives), adjustPhi when p needs a reference,
  pRefCell=0/pRefValue=0;
- the face flux phi is itself an adjoint state:
  R_phi = phiHbyA - pEqn.flux() - phi;
- turbulence model states are spliced into the state (models/).

The whole primal is ONE jitted lax.while_loop — no per-iteration host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.mesh.walldist import compute_wall_distance
from dafoam_tpu.mesh.geometry import compute_geometry
from dafoam_tpu.models import make_turbulence_model
from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops import fvmatrix as fvx
from dafoam_tpu.solvers.base import DASolverBase, PrimalInfo
from dafoam_tpu.states import StateInfo


class DASimpleFoam(DASolverBase):

    def __init__(self, option, topo, points):
        from dafoam_tpu.option import DAOption
        opt = option if isinstance(option, DAOption) else DAOption(option)
        turb_name = opt["turbulenceModel"]
        # state roster depends on the turbulence model (reference
        # DAStateInfoSimpleFoam registers U,p,phi + model states)
        from dafoam_tpu.models import _TURB_REGISTRY
        model_states = _TURB_REGISTRY[turb_name].model_states
        # optional passive temperature field (reference hasTField,
        # DAResidualSimpleFoam.C:50 / :215-236) — enables aerothermal CHT
        self.has_T = "T" in opt.get("boundaryConditions", {})
        vol_scalar = ("p", "T") if self.has_T else ("p",)
        self.state_info = StateInfo(vol_vector=("U",), vol_scalar=vol_scalar,
                                    model=tuple(model_states),
                                    surface_scalar=("phi",))
        super().__init__(opt, topo, points)

        # frozen wall distance (meshWaveFrozen semantics)
        geom0 = compute_geometry(self.points, topo)
        wd = compute_wall_distance(geom0, topo, points=np.asarray(points))
        self.wall_dist = jnp.asarray(wd, self.dtype)
        self.turb = make_turbulence_model(
            turb_name, topo, self.option, wall_dist=self.wall_dist,
            bc_spec=self.bc_spec) \
            if turb_name not in ("None", "laminar") else \
            make_turbulence_model(turb_name, topo, self.option,
                                  wall_dist=self.wall_dist)

        # robust default: upwind; cases opt into the 2nd-order
        # linearUpwind via divSchemes (the reference's airfoil cases do)
        self.div_u_scheme = self.option["divSchemes"].get(
            "div(phi,U)", "upwind")
        # p has a Dirichlet patch? then no reference cell is needed
        pspec = self.bc_spec.get("p", {})
        self.p_needs_ref = not any(
            s["type"] in ("fixedValue",) for s in pspec.values())
        # which boundary faces have a fixed (non-adjustable) velocity
        ni = topo.n_internal
        fixed = np.zeros((topo.n_faces - ni,))
        for p in topo.patches:
            s = self.bc_spec.get("U", {}).get(p.name, {"type": "zeroGradient"})
            if s["type"] in ("fixedValue", "noSlip", "empty") \
                    or p.kind == "empty":
                fixed[p.start - ni:p.start - ni + p.size] = 1.0
        self._fixed_flux_b = jnp.asarray(fixed, self.dtype)
        self._user_bounds = (option.get("primalVarBounds", {})
                             if isinstance(option, dict) else {})
        self.turb.setup_wall_functions(self.bc_spec)
        # field inversion / data-driven turbulence: beta multiplier on the
        # SA production (reference DARegression + betaFI `field` input)
        if hasattr(self.turb, "beta_fn"):
            # beta_fn checks inputs at runtime (betaFI field and/or active
            # regression models); a plain 1.0 short-circuit keeps the cost
            # zero when neither is configured
            self.turb.beta_fn = self._compute_beta

    def regression_n_params(self, model_name):
        from dafoam_tpu import regression
        cfg = self.option["regressionModel"][model_name]
        if cfg.get("modelType", "neuralNetwork") == "neuralNetwork":
            return regression.nn_sizes(cfg["hiddenLayerNeurons"],
                                       len(cfg["inputNames"]))
        return 2 * cfg["nRBFs"] * len(cfg["inputNames"]) + cfg["nRBFs"]

    def _compute_beta(self, state, inputs, geom, gradU):
        """beta(W; theta): product of an optional betaFI cell field and any
        active regression models (reference DARegression.compute)."""
        from dafoam_tpu import regression

        beta = None
        bfi = inputs["params"].get("betaFI")
        if bfi is not None:
            beta = bfi
        rm = self.option.get("regressionModel", {})
        reg_par = inputs["params"].get("regressionPar", {})
        if rm.get("active"):
            p = state["p"]
            p_bco = self._bco_p(p, inputs, geom, state["phi"])
            p_b = bc.boundary_value(p_bco, p, self.topo)
            fctx = {"U": state["U"], "gradU": gradU, "p": p,
                    "gradp": fvc.grad(geom, self.topo, p, p_b),
                    "nuTilda": state.get("nuTilda"),
                    "nut": self.turb.nut(state, inputs, geom),
                    "nu": inputs["params"]["nu"] * jnp.ones_like(p),
                    "wall_dist": self.wall_dist,
                    "k": state.get("k")}
            for name, cfg in rm.items():
                if name == "active" or not isinstance(cfg, dict):
                    continue
                theta = reg_par.get(name)
                if theta is None:
                    continue
                b = regression.evaluate(cfg, theta, fctx)
                beta = b if beta is None else beta * b
        if beta is None:
            return 1.0
        return beta

    # ------------------------------------------------------------------
    # BC helpers
    # ------------------------------------------------------------------
    def _bco_U(self, U, inputs, geom, phi):
        vals = inputs["bc"].get("U", {})
        mrf = self.option.get("MRF", {})
        if mrf.get("active") and mrf.get("rotatingPatches"):
            from dafoam_tpu import mrf as mrfm
            vals = dict(vals)
            vals.update(mrfm.rotating_wall_values(
                mrf, geom, self.topo, mrf["rotatingPatches"], inputs,
                self.dtype))
        return bc.coeffs(self.bc_spec["U"], vals,
                         self.topo, geom, U, rank=1,
                         phi_b=phi[self.topo.n_internal:],
                         t=inputs.get("t", 0.0))

    def _bco_p(self, p, inputs, geom, phi):
        return bc.coeffs(self.bc_spec["p"], inputs["bc"].get("p", {}),
                         self.topo, geom, p, rank=0,
                         phi_b=phi[self.topo.n_internal:],
                         t=inputs.get("t", 0.0))

    # ------------------------------------------------------------------
    # shared assembly: momentum eqn + pressure projection pieces
    # ------------------------------------------------------------------
    def _ueqn(self, state, inputs, geom, is_pc=False):
        U, phi = state["U"], state["phi"]
        U_bco = self._bco_U(U, inputs, geom, phi)
        scheme = "upwind" if is_pc else self.div_u_scheme
        M = fvm.div(geom, self.topo, phi, U, U_bco, scheme=scheme,
                    bounded=True) \
            + self.turb.divdevreff(U, state, inputs, geom, U_bco)
        mrf = self.option.get("MRF", {})
        if mrf.get("active"):
            from dafoam_tpu import mrf as mrfm
            # + MRF.DDt(U): contribution += (Omega x U) V in the zone
            M = M.add_source(-mrfm.ddt_source(mrf, U, geom, inputs)
                             * geom.vol[:, None])
        # porosity / topology-optimization sink (reference fvm::Sp(
        # alphaPorosity, U) in UEqnSimple.H; the DATopoChtFoam design var)
        alpha_por = inputs["params"].get("alphaPorosity")
        if alpha_por is not None:
            M = M + fvm.Sp(geom, self.topo, alpha_por, U)
        if self.option.get("fvSource"):
            from dafoam_tpu.fvsource import compute_fv_source
            src = compute_fv_source(self.option, inputs, geom, self.dtype)
            if src is not None:
                # UEqn: ... - fvSource  (reference UEqnSimple.H)
                M = M.add_source(src * geom.vol[:, None])
        alpha = self.option["relaxationFactors"]["equations"].get("U", 0.7)
        M = fvx.relax(M, U, alpha, self.topo)
        return M, U_bco

    def _projection(self, state, inputs, geom, UEqn, U_bco, U_pred):
        """rAU, HbyA, phiHbyA, pressure matrix — shared by primal iteration
        and residual evaluation."""
        topo = self.topo
        ni = topo.n_internal
        p, phi = state["p"], state["phi"]
        p_bco = self._bco_p(p, inputs, geom, phi)
        p_b = bc.boundary_value(p_bco, p, topo)

        rAU = 1.0 / fvx.A(UEqn, geom)
        HbyA = rAU[:, None] * fvx.H(UEqn, U_pred, geom, topo)
        # boundary HbyA: U's value on value-fixing patches (constrainHbyA),
        # else extrapolated
        from dafoam_tpu.ops.core import boundary_gather
        U_b = bc.boundary_value(U_bco, U_pred, topo)
        HbyA_own = boundary_gather(HbyA, topo)
        if self.option["useConstrainHbyA"]:
            HbyA_b = jnp.where(self._fixed_flux_b[:, None] > 0.5,
                               U_b, HbyA_own)
        else:
            HbyA_b = HbyA_own
        phiHbyA = fvc.flux(geom, topo, HbyA, HbyA_b)

        mrf = self.option.get("MRF", {})
        if mrf.get("active"):
            from dafoam_tpu import mrf as mrfm
            phiHbyA = mrfm.make_relative(mrf, phiHbyA, geom, topo, inputs)

        if self.p_needs_ref:
            phiHbyA = self._adjust_phi(phiHbyA, geom)

        # SIMPLEC (reference simple.consistent() rAtU correction,
        # DAResidualSimpleFoam.C): rAtU = 1/(1/rAU - H1);
        # phiHbyA += interp(rAtU-rAU)*snGrad(p)*magSf; HbyA -= (rAU-rAtU)*grad(p)
        if self.option["simple"]["consistent"]:
            rAtU = 1.0 / (1.0 / rAU - fvx.H1(UEqn, geom, topo))
            drA = rAtU - rAU
            drA_f = fvc.interpolate(geom, topo, drA,
                                    boundary_gather(drA, topo))
            sng_b = bc.boundary_sngrad(p_bco, p, topo)
            snp = fvc.snGrad(geom, topo, p, sng_b)
            phiHbyA = phiHbyA + drA_f * snp * geom.magsf
            gradp = fvc.grad(geom, topo, p, p_b)
            HbyA = HbyA + drA[:, None] * gradp
        else:
            rAtU = rAU

        rA_b = boundary_gather(rAtU, topo)
        rAtU_f = fvc.interpolate(geom, topo, rAtU, rA_b)
        pM = fvm.laplacian(geom, topo, rAtU_f, p, p_bco)
        # pEqn: laplacian(rAtU, p) == div(phiHbyA)
        div_phiHbyA = fvc.div_surface(geom, topo, phiHbyA) * geom.vol
        pM = pM.add_source(div_phiHbyA)
        if self.p_needs_ref:
            pM = fvx.set_reference(pM, 0, 0.0)
        return rAtU, rAtU_f, HbyA, phiHbyA, pM, p_bco

    def _adjust_phi(self, phiHbyA, geom):
        """Global mass-conservation fix for all-Neumann pressure (OpenFOAM
        adjustPhi, called in both the primal and the residual,
        DAResidualSimpleFoam.C:185)."""
        ni = self.topo.n_internal
        phib = phiHbyA[ni:]
        adj = 1.0 - self._fixed_flux_b
        outflow = (phib > 0.0).astype(phib.dtype)
        mass_in = -jnp.sum(phib * (1.0 - outflow))
        fixed_out = jnp.sum(phib * outflow * self._fixed_flux_b)
        adj_out = jnp.sum(phib * outflow * adj)
        corr = (mass_in - fixed_out) / jnp.where(
            jnp.abs(adj_out) > 1e-36, adj_out, 1.0)
        phib_new = jnp.where((outflow > 0.5) & (adj > 0.5),
                             phib * corr, phib)
        return phiHbyA.at[ni:].set(phib_new)

    # ------------------------------------------------------------------
    # residuals (adjoint)
    # ------------------------------------------------------------------
    def _teqn_simple(self, state, inputs, geom):
        """Passive temperature transport: div(phi,T) - laplacian(alphaEff,T)
        with alphaEff = nu/Pr + nut/Prt (reference
        DAResidualSimpleFoam.C:215-236)."""
        topo = self.topo
        T, phi = state["T"], state["phi"]
        prm = inputs["params"]
        Pr = prm.get("Pr", 0.7)
        Prt = prm.get("Prt", 0.85)
        nu = prm["nu"]
        T_bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                          topo, geom, T, rank=0,
                          phi_b=phi[topo.n_internal:],
                          t=inputs.get("t", 0.0))
        alpha_eff = nu / Pr + self.turb.nut(state, inputs, geom) / Prt
        alpha_b = nu / Pr + self.turb.nut_boundary(state, inputs, geom) / Prt
        alpha_f = fvc.interpolate(geom, topo, alpha_eff, alpha_b)
        M = fvm.div(geom, topo, phi, T, T_bco, scheme="upwind",
                    bounded=True) \
            - fvm.laplacian(geom, topo, alpha_f, T, T_bco)
        return M, T_bco

    def thermal_conductance(self, state, inputs, geom):
        """(nb,) Cp*alphaEff at boundary owners — the kappa piece of the
        CHT protocol, incompressible side (DAOutputThermalCoupling.C:94)."""
        prm = inputs["params"]
        Cp = prm.get("Cp", 1004.5)
        nu = prm["nu"]
        Pr = prm.get("Pr", 0.7)
        Prt = prm.get("Prt", 0.85)
        alpha_b = nu / Pr + self.turb.nut_boundary(state, inputs, geom) / Prt
        return Cp * alpha_b

    def residuals(self, state, inputs):
        geom = self.geometry(inputs)
        topo = self.topo
        U, p, phi = state["U"], state["p"], state["phi"]
        UEqn, U_bco = self._ueqn(state, inputs, geom)
        p_bco0 = self._bco_p(p, inputs, geom, phi)
        p_b = bc.boundary_value(p_bco0, p, topo)
        gradp = fvc.grad(geom, topo, p, p_b)

        r_U = fvx.residual(UEqn, U, geom, topo) + gradp

        rAU, rAU_f, HbyA, phiHbyA, pM, p_bco = self._projection(
            state, inputs, geom, UEqn, U_bco, U)
        r_p = fvx.residual(pM, p, geom, topo)
        p_flux = fvm.laplacian_flux(geom, topo, rAU_f, p, p_bco)
        r_phi = phiHbyA - p_flux - phi

        out = {"U": r_U, "p": r_p, "phi": r_phi}
        if self.has_T:
            TEqn, _ = self._teqn_simple(state, inputs, geom)
            out["T"] = fvx.residual(TEqn, state["T"], geom, topo)
        if self.turb.model_states:
            U_b = bc.boundary_value(U_bco, U, topo)
            gradU = fvc.grad(geom, topo, U, U_b)
            out.update(self.turb.residuals(state, inputs, geom, phi,
                                           gradU=gradU))
        return out

    # ------------------------------------------------------------------
    # primal
    # ------------------------------------------------------------------
    def init_state(self):
        st = super().init_state()
        geom = compute_geometry(self.points, self.topo)
        inputs = self.make_inputs()
        Ubco = bc.coeffs(self.bc_spec["U"], inputs["bc"].get("U", {}),
                         self.topo, geom, st["U"], rank=1,
                         phi_b=jnp.zeros((self.topo.n_boundary,), self.dtype))
        U_b = bc.boundary_value(Ubco, st["U"], self.topo)
        st["phi"] = fvc.flux(geom, self.topo, st["U"], U_b)
        return st

    def _bound(self, name, v):
        b = self._user_bounds
        lo, hi = b.get(name + "Min"), b.get(name + "Max")
        if lo is None and hi is None:
            return v
        return jnp.clip(v, lo if lo is not None else -jnp.inf,
                        hi if hi is not None else jnp.inf)

    def primal_step(self, state, inputs, geom=None):
        """ONE outer SIMPLE iteration: the fixed-point map G with
        w_{k+1} = G(w_k). Reverse-differentiable end-to-end (inner solves
        are lax.custom_linear_solve), which is what the solver-level
        fixed-point adjoint differentiates (reference runFPAdj,
        DASimpleFoam.C:189). Returns (new_state, max_normalized_residual).
        """
        if geom is None:
            geom = self.geometry(inputs)
        topo = self.topo
        opt = self.option
        lin = opt["primalLinearSolver"]
        alpha_p = opt["relaxationFactors"]["fields"].get("p", 0.3)

        def one_iter(state):
            U, p, phi = state["U"], state["p"], state["phi"]
            UEqn, U_bco = self._ueqn(state, inputs, geom)
            p_bco = self._bco_p(p, inputs, geom, phi)
            p_b = bc.boundary_value(p_bco, p, topo)
            gradp = fvc.grad(geom, topo, p, p_b)
            rhs_U = -gradp * geom.vol[:, None]
            res_U = fvsolve.initial_residual_norm(UEqn, U, topo, rhs=rhs_U)

            if opt["simple"]["momentumPredictor"]:
                U_pred, _ = fvsolve.solve(
                    UEqn, U, topo, symmetric=False,
                    rel_tol=lin["uRelTol"], max_iters=lin["uMaxIters"],
                    rhs=rhs_U)
                U_pred = self._bound("U", U_pred)
            else:
                U_pred = U

            rAU, rAU_f, HbyA, phiHbyA, pM, p_bco = self._projection(
                state, inputs, geom, UEqn, U_bco, U_pred)
            res_p = fvsolve.initial_residual_norm(pM, p, topo)
            p_new, _ = fvsolve.solve(pM, p, topo, symmetric=True,
                                     rel_tol=lin["pRelTol"],
                                     max_iters=lin["pMaxIters"],
                                     pc=lin.get("pPC", "jacobi"))
            phi_new = phiHbyA - fvm.laplacian_flux(geom, topo, rAU_f, p_new,
                                                   p_bco)
            # explicit pressure relaxation, then momentum corrector
            p_rel = p + alpha_p * (p_new - p)
            p_rel = self._bound("p", p_rel)
            p_bco2 = self._bco_p(p_rel, inputs, geom, phi_new)
            p_b2 = bc.boundary_value(p_bco2, p_rel, topo)
            gradp2 = fvc.grad(geom, topo, p_rel, p_b2)
            U_new = HbyA - rAU[:, None] * gradp2
            U_new = self._bound("U", U_new)

            new_state = dict(state, U=U_new, p=p_rel, phi=phi_new)

            if self.turb.model_states:
                U_b = bc.boundary_value(U_bco, U_new, topo)
                gradU = fvc.grad(geom, topo, U_new, U_b)
                relax_t = opt["relaxationFactors"]["equations"].get(
                    "nuTilda", 0.7)
                new_state = self.turb.correct(
                    new_state, inputs, geom, phi_new, gradU=gradU,
                    rel_tol=lin["turbRelTol"], max_iters=lin["turbMaxIters"],
                    relax=relax_t)

            if self.has_T:
                TEqn, _ = self._teqn_simple(new_state, inputs, geom)
                alphaT = opt["relaxationFactors"]["equations"].get("T", 0.7)
                TEqn_r = fvx.relax(TEqn, new_state["T"], alphaT, topo)
                T_new, _ = fvsolve.solve(TEqn_r, new_state["T"], topo,
                                         symmetric=False,
                                         rel_tol=lin["turbRelTol"],
                                         max_iters=lin["turbMaxIters"])
                new_state = dict(new_state, T=self._bound("T", T_new))

            return new_state, jnp.maximum(res_U, res_p)

        return one_iter(state)

    def solve_primal(self, state, inputs):
        geom = self.geometry(inputs)
        opt = self.option
        tol = opt["primalMinResTol"]
        max_it = opt["primalMaxIters"]
        min_it = opt["primalMinIters"]

        def one_iter(st):
            return self.primal_step(st, inputs, geom)

        # step-averaged states (reference useMeanStates, pyDAFoam.py:486;
        # DASolver::meanStatesToStates, DASolver.C:4210): running mean of
        # the vol/model states over the last (1-meanStateStart) fraction
        # of the iteration budget, substituted for the final state at
        # exit. phi keeps its final value (the reference averages
        # volVector/volScalar/model states only).
        use_mean = bool(opt["useMeanStates"])
        start_it = int(float(opt.get("meanStateStart", 0.5)) * int(max_it))

        def _mean_update(mean, st2, it):
            # it: 0-based index of the iteration just completed
            cnt = jnp.maximum(it + 1 - start_it, 1).astype(self.dtype)
            take = it >= start_it
            return {k: (jnp.where(take, m + (st2[k] - m) / cnt, m)
                        if k != "phi" else m)
                    for k, m in mean.items()}

        def _mean_final(st, mean, it):
            if not use_mean:
                return st
            have = it > start_it
            return {k: (jnp.where(have, mean[k], st[k])
                        if k != "phi" else st[k]) for k in st}

        mean0 = jax.tree_util.tree_map(jnp.zeros_like, state)

        # trailing-window function std/slope convergence (reference
        # DASolver::loop + calcFuncStd/calcFuncSlope, DASolver.C:156-316)
        fscfg = opt["primalFuncStdTol"]
        std_tol = float(fscfg.get("stdTol", -1.0))
        slope_tol = float(fscfg.get("slopeTol", -1.0))
        if std_tol > 0 and slope_tol <= 0:
            slope_tol = std_tol  # reference DASolver.C:105
        func_names = [n for n in fscfg.get("funcNames", [])
                      if n in opt["function"]]
        track = std_tol > 0 and len(func_names) > 0
        frac = float(fscfg.get("nStepsFrac", 0.2))
        tol_diff = float(opt["primalMinResTolDiff"])
        print_int = int(opt["printInterval"])
        do_print = bool(opt.get("printToScreen", False))

        if not track:
            def cond(c):
                st, mean, it, res = c
                keep = jnp.logical_or(it < min_it, res > tol)
                keep = jnp.logical_and(keep, it < max_it)
                return jnp.logical_and(keep, self.states_valid(st))

            def body(c):
                st, mean, it, res = c
                st2, res2 = one_iter(st)
                if use_mean:
                    mean = _mean_update(mean, st2, it)
                if do_print:
                    jax.lax.cond(
                        (it + 1) % print_int == 0,
                        lambda: jax.debug.print(
                            "iter {i}: maxRes = {r:.6e}", i=it + 1, r=res2),
                        lambda: None)
                return st2, mean, it + 1, res2

            st, mean, it, res = jax.lax.while_loop(
                cond, body, (state, mean0, jnp.asarray(0),
                             jnp.asarray(jnp.inf, self.dtype)))
            st = _mean_final(st, mean, it)
            ok = self.states_valid(st)
            # checkPrimalFailure parity (reference DASolver.C:2721): fail
            # when achieved residual misses primalMinResTol*TolDiff
            failed = jnp.logical_not(ok)
            if tol > 0:
                failed = jnp.logical_or(failed, res > tol * tol_diff)
            return st, PrimalInfo(it, res,
                                  jnp.logical_and(res <= tol, ok), failed)

        # tracked path: carry per-iteration function values
        big = jnp.asarray(jnp.inf, self.dtype)

        def window_stats(vals, it):
            """relative std + |LS slope| over the trailing window
            (DASolver.C:235-316 semantics, masked for jit)."""
            n = vals.shape[0]
            idx = jnp.arange(n)
            li = it - 1
            window = jnp.maximum(2, jnp.round(
                frac * (li + 1.0)).astype(idx.dtype))
            start = jnp.maximum(0, li - window + 1)
            m = ((idx >= start) & (idx <= li)).astype(vals.dtype)
            cnt = jnp.sum(m)
            mean = jnp.sum(vals * m) / (cnt + 1e-16)
            var = jnp.sum(m * (vals - mean) ** 2) / (cnt + 1e-16)
            std = jnp.sqrt(var) / jnp.abs(mean + 1e-16)
            x = (idx - start).astype(vals.dtype) * m
            xmean = jnp.sum(x * m) / (cnt + 1e-16)
            dx = (x - xmean) * m
            sxy = jnp.sum(dx * (vals - mean) * m)
            sxx = jnp.sum(dx * dx)
            slope = (sxy / (sxx + 1e-16)) / jnp.abs(mean + 1e-16)
            # fewer than 2 actual samples: std/slope are degenerate zeros;
            # report inf so the exit test cannot fire spuriously
            big_ = jnp.asarray(jnp.inf, vals.dtype)
            std = jnp.where(cnt >= 2, std, big_)
            slope = jnp.where(cnt >= 2, slope, big_)
            return std, jnp.abs(slope)

        def cond(c):
            st, mean, it, res, fvals, fstd, fslope = c
            func_conv = jnp.logical_and(fstd < std_tol, fslope < slope_tol)
            conv = jnp.logical_or(res <= tol, func_conv)
            keep = jnp.logical_or(it < min_it, jnp.logical_not(conv))
            keep = jnp.logical_and(keep, it < max_it)
            return jnp.logical_and(keep, self.states_valid(st))

        def body(c):
            st, mean, it, res, fvals, fstd, fslope = c
            st2, res2 = one_iter(st)
            if use_mean:
                mean = _mean_update(mean, st2, it)
            stds, slopes = [], []
            for j, name in enumerate(func_names):
                v = self.eval_function(name, st2, inputs)
                fvals = fvals.at[j, it].set(v)
                s, sl = window_stats(fvals[j], it + 1)
                stds.append(s)
                slopes.append(sl)
            fstd2 = jnp.max(jnp.stack(stds))
            fslope2 = jnp.max(jnp.stack(slopes))
            if do_print:
                jax.lax.cond(
                    (it + 1) % print_int == 0,
                    lambda: jax.debug.print(
                        "iter {i}: maxRes={r:.6e} funcStd={s:.6e} "
                        "funcSlope={sl:.6e}", i=it + 1, r=res2, s=fstd2,
                        sl=fslope2),
                    lambda: None)
            return st2, mean, it + 1, res2, fvals, fstd2, fslope2

        fvals0 = jnp.zeros((len(func_names), int(max_it)), self.dtype)
        st, mean, it, res, fvals, fstd, fslope = jax.lax.while_loop(
            cond, body, (state, mean0, jnp.asarray(0),
                         jnp.asarray(jnp.inf, self.dtype), fvals0, big, big))
        st = _mean_final(st, mean, it)
        ok = self.states_valid(st)
        func_conv = jnp.logical_and(fstd < std_tol, fslope < slope_tol)
        conv = jnp.logical_and(jnp.logical_or(res <= tol, func_conv), ok)
        # func-std mode never fails on residual (DASolver.C:2730-2735)
        return st, PrimalInfo(it, res, conv, jnp.logical_not(ok))

    # ------------------------------------------------------------------
    # adjoint preconditioner: reuse the segregated operators
    # ------------------------------------------------------------------
    def make_adjoint_pc(self, state, inputs):
        from dafoam_tpu.adjoint.precond import build_pc

        geom = self.geometry(inputs)
        UEqn, U_bco = self._ueqn(state, inputs, geom, is_pc=True)
        _, _, _, _, pM, _ = self._projection(state, inputs, geom, UEqn,
                                             U_bco, state["U"])
        mats = {"U": (UEqn, False), "p": (pM, True)}
        if self.turb.model_states:
            U_b = bc.boundary_value(U_bco, state["U"], self.topo)
            gradU = fvc.grad(geom, self.topo, state["U"], U_b)
            mats.update(self.turb.pc_matrices(state, inputs, geom,
                                              state["phi"], gradU))
        return build_pc(mats, self.topo, geom, self.state_scales(geom),
                        self.option["adjEqnOption"])

    def make_forward_pc(self, state, inputs):
        """PC for the forward linearized system dR/dW (untransposed twin
        of make_adjoint_pc; see precond.build_forward_pc)."""
        from dafoam_tpu.adjoint.precond import build_forward_pc

        geom = self.geometry(inputs)
        UEqn, U_bco = self._ueqn(state, inputs, geom, is_pc=True)
        _, _, _, _, pM, _ = self._projection(state, inputs, geom, UEqn,
                                             U_bco, state["U"])
        mats = {"U": (UEqn, False), "p": (pM, True)}
        if self.turb.model_states:
            U_b = bc.boundary_value(U_bco, state["U"], self.topo)
            gradU = fvc.grad(geom, self.topo, state["U"], U_b)
            mats.update(self.turb.pc_matrices(state, inputs, geom,
                                              state["phi"], gradU))
        return build_forward_pc(mats, self.topo, geom,
                                self.option["adjEqnOption"])

    # ------------------------------------------------------------------
    # function context
    # ------------------------------------------------------------------
    def boundary_fields(self, state, inputs, geom):
        topo = self.topo
        U, p, phi = state["U"], state["p"], state["phi"]
        U_bco = self._bco_U(U, inputs, geom, phi)
        p_bco = self._bco_p(p, inputs, geom, phi)
        out = {"U": bc.boundary_value(U_bco, U, topo),
               "p": bc.boundary_value(p_bco, p, topo)}
        if self.has_T:
            T_bco = bc.coeffs(self.bc_spec["T"], inputs["bc"].get("T", {}),
                              topo, geom, state["T"], rank=0,
                              phi_b=phi[topo.n_internal:],
                              t=inputs.get("t", 0.0))
            out["T"] = bc.boundary_value(T_bco, state["T"], topo)
        return out

    def function_ctx(self, state, inputs, with_residuals=False):
        ctx = super().function_ctx(state, inputs, with_residuals)
        geom = ctx["geom"]
        topo = self.topo
        ni = topo.n_internal
        U, phi = state["U"], state["phi"]
        U_bco = self._bco_U(U, inputs, geom, phi)
        U_b = bc.boundary_value(U_bco, U, topo)
        gradU = fvc.grad(geom, topo, U, U_b)
        sng_b = bc.boundary_sngrad(U_bco, U, topo)
        nhat = geom.sf[ni:] / jnp.maximum(geom.magsf[ni:], 1e-36)[:, None]
        from dafoam_tpu.ops.core import boundary_gather
        gU_own = boundary_gather(gradU, topo)
        ctx["gradU_b"] = gU_own + nhat[:, :, None] * (
            sng_b - jnp.einsum("fi,fij->fj", nhat, gU_own))[:, None, :]
        nu = inputs["params"]["nu"]
        ctx["nu_eff_b"] = self.turb.nut_boundary(state, inputs, geom) + nu
        ctx["rho_ref"] = inputs["params"].get("rhoRef", 1.0)
        if "patchVelocity" in inputs.get("aoa", {}):
            ctx["aoa_rad"] = inputs["aoa"]["patchVelocity"][1] * jnp.pi / 180.0
        return ctx
