"""Solver base: the TPU-native counterpart of the reference's DASolver.

The reference's DASolver (src/adjoint/DASolver/DASolver.H:233) owns the mesh,
the AD tape, primal loop control, matrix-free dRdWT products, and failure
handling. Here the same responsibilities become:

- one pure ``residuals(state, inputs)`` function per concrete solver (the
  DAResidual family collapses into it);
- ``solve_primal`` — a jitted, device-resident iteration;
- ``solve_adjoint`` / ``total_derivative`` — wrappers over
  ``dafoam_tpu.adjoint`` with the state/residual normalization the
  reference applies in DASolver.C:2356/1443;
- primal failure detection (NaN/blow-up -> invalid state; reference
  DASolver::validateStates / checkPrimalFailure, DASolver.C:3787).

``inputs`` is a pytree {points, bc: {field: {patch: value}}, params: {...}}
— every leaf is a legal differentiation target, which subsumes the
reference's DAInput family (volCoord = points, patchVelocity/patchVar = bc
leaves, field/regressionPar = params leaves).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dafoam_tpu.adjoint import solver as adjsolver
from dafoam_tpu.functions import evaluate_function
from dafoam_tpu.linalg import fvsolve
from dafoam_tpu.mesh.geometry import compute_geometry
from dafoam_tpu.option import DAOption
from dafoam_tpu.states import StateInfo, StateLayout

# DAMisc parametric BC types (ops/bc.py): their numeric parameters are
# exposed as traced inputs so they can be design variables
_PARAMETRIC_BC_TYPES = (
    "multiFreqScalar", "multiFreqVector", "varyingVelocity",
    "varyingVelocityInletOutlet", "homTemp", "wallHeatFluxTransfer",
    "fixedWallHeatFlux")
# spec keys that stay static (structure, not values)
_STATIC_BC_KEYS = ("type", "component", "flowComponent",
                   "normalComponent", "endTime", "value")


class PrimalInfo(NamedTuple):
    iters: jnp.ndarray
    max_res: jnp.ndarray      # max normalized eqn residual at exit
    converged: jnp.ndarray
    failed: jnp.ndarray       # NaN / bounds blow-up detected


class DASolverBase:
    state_info: StateInfo = StateInfo()

    def __init__(self, option, topo, points):
        self.option = option if isinstance(option, DAOption) else DAOption(option)
        self.topo = topo
        self.dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.points = jnp.asarray(points, self.dtype)
        self.layout = StateLayout(
            self.state_info, topo.n_cells, topo.n_faces,
            ordering=self.option.get("adjStateOrdering", "state"))
        # static BC types; traced values split into inputs
        self.bc_spec = {}
        self.bc_values0 = {}
        for field, patches in self.option.get("boundaryConditions", {}).items():
            self.bc_spec[field] = {}
            self.bc_values0[field] = {}
            for pname, spec in patches.items():
                self.bc_spec[field][pname] = {
                    k: v for k, v in spec.items() if k != "value"}
                if spec.get("type") in _PARAMETRIC_BC_TYPES:
                    # DAMisc parametric BCs: every numeric parameter is a
                    # traced input (differentiable design variable); the
                    # structural ones (component indices etc.) stay static
                    self.bc_values0[field][pname] = {
                        k: jnp.asarray(v, self.dtype)
                        for k, v in spec.items()
                        if k not in _STATIC_BC_KEYS}
                elif "value" in spec:
                    self.bc_values0[field][pname] = jnp.asarray(
                        spec["value"], self.dtype)
        # default empty-patch handling: every field gets "empty" on empty kinds
        for field in self.bc_spec:
            for p in topo.patches:
                if p.kind == "empty":
                    self.bc_spec[field][p.name] = {"type": "empty"}
                elif p.name not in self.bc_spec[field]:
                    self.bc_spec[field][p.name] = {"type": "zeroGradient"}

    # ------------------------------------------------------------------
    # inputs
    # ------------------------------------------------------------------
    def make_inputs(self) -> dict:
        params = {k: jnp.asarray(v, self.dtype)
                  for k, v in self.option["transportProperties"].items()}
        return {"points": self.points,
                "bc": jax.tree_util.tree_map(jnp.asarray, self.bc_values0),
                "params": params}

    def geometry(self, inputs):
        return compute_geometry(inputs["points"], self.topo)

    # ------------------------------------------------------------------
    # abstract interface
    # ------------------------------------------------------------------
    def residuals(self, state: dict, inputs: dict) -> dict:
        raise NotImplementedError

    def solve_primal(self, state: dict, inputs: dict):
        raise NotImplementedError

    def init_state(self) -> dict:
        st = self.layout.zeros(self.dtype)
        for name, val in self.option.get("initialFields", {}).items():
            if name in st:
                st[name] = jnp.broadcast_to(
                    jnp.asarray(val, self.dtype), st[name].shape)
        return st

    # ------------------------------------------------------------------
    # residual post-scaling (normalizeResiduals semantics, reference
    # src/include/DAMacroFunctions.H:28-50)
    # ------------------------------------------------------------------
    def _apply_res_norm(self, res: dict, geom) -> dict:
        listed = set(self.option["normalizeResiduals"])
        out = {}
        for k, v in res.items():
            rname = k + "Res"
            if k == "phi":
                if "phiRes" in listed:
                    # neutral scale on degenerate (zero-area) padded faces
                    # of the dense-DIA layout: their R_phi row is -phi
                    # (identity), already O(1)
                    out[k] = v / jnp.where(geom.magsf > 0.0, geom.magsf, 1.0)
                else:
                    out[k] = v
            elif rname in listed:
                out[k] = v               # per-volume form (fv residual)
            else:
                vol = geom.vol if v.ndim == 1 else geom.vol[:, None]
                out[k] = v * vol         # volume-integrated form
        return out

    def state_scales(self, geom) -> dict:
        ns = self.option["normalizeStates"]
        out = {}
        for name, _k in self.state_info.ordered:
            s = ns.get(name, 1.0)
            if name == "phi":
                # degenerate (zero-area) padded faces of the dense-DIA
                # layout get a neutral scale of 1 (their R_phi row is the
                # identity -phi, already O(1))
                out[name] = s * jnp.where(geom.magsf > 0.0, geom.magsf, 1.0)
            else:
                out[name] = jnp.asarray(s, self.dtype)
        return out

    # ------------------------------------------------------------------
    # functions
    # ------------------------------------------------------------------
    def function_ctx(self, state, inputs, with_residuals=False) -> dict:
        """Build the evaluation context for the function registry."""
        geom = self.geometry(inputs)
        ctx = {"state": state, "geom": geom, "topo": self.topo,
               "boundary": self.boundary_fields(state, inputs, geom),
               "phi": state.get("phi", jnp.zeros((self.topo.n_faces,),
                                                 self.dtype)),
               "aux": self.aux_fields(state, inputs, geom),
               "data": inputs.get("data", {})}
        if with_residuals:
            ctx["residuals"] = self.residuals(state, inputs)
        return ctx

    def boundary_fields(self, state, inputs, geom) -> dict:
        """Override: boundary-face values of each field for functions."""
        return {}

    def aux_fields(self, state, inputs, geom) -> dict:
        return {}

    def eval_function(self, name, state, inputs):
        cfg = self.option["function"][name]
        ctx = self.function_ctx(state, inputs,
                                with_residuals=cfg["type"] == "residualNorm")
        return evaluate_function(cfg, ctx)

    def eval_functions(self, state, inputs) -> dict:
        return {n: self.eval_function(n, state, inputs)
                for n in self.option["function"]}

    # ------------------------------------------------------------------
    # adjoint + totals
    # ------------------------------------------------------------------
    def _norm_residuals(self, state, inputs):
        geom = self.geometry(inputs)
        return self._apply_res_norm(self.residuals(state, inputs), geom)

    def make_adjoint_pc(self, state, inputs):
        """Override: return a GMRES preconditioner callable (or None)."""
        return None

    def solve_adjoint_rhs(self, state, inputs, dJdW, psi0=None,
                          precond=None, aug0=None, return_aug=False):
        """Solve dR/dW^T psi = dJdW for a caller-supplied RHS pytree.

        This is the MPhys ``solve_linear`` contract (reference
        mphys_dafoam.py:433-574: the RHS comes from d_outputs, not from a
        named function)."""
        opt = self.option["adjEqnOption"]
        geom = self.geometry(inputs)
        scales = self.state_scales(geom)
        # fp mode never uses the Krylov PC — dispatch BEFORE building it
        # (pcType then only configures forward_total_derivative's PC)
        if not self._fp_adjoint() and precond is None \
                and opt.get("pcType", "none") != "none":
            precond = self.make_adjoint_pc(state, inputs)
        res_fn = lambda w, x: self._norm_residuals(w, x)  # noqa: E731
        if self._fp_adjoint():
            # reference runFPAdj (DASimpleFoam.C:189): adjoint of the
            # primal step map (see adjoint_solve_fp). NOTE: in this mode
            # the returned vector is psibar (step-map convention); pair
            # it with total_derivative, which dispatches accordingly.
            return adjsolver.adjoint_solve_fp(
                self._fp_step_fn(), state, inputs, dJdW,
                rel_tol=opt.get("fpRelTol", 1e-6),
                abs_tol=opt["gmresAbsTol"],
                max_iters=opt.get("fpMaxIters", 1000),
                relax=opt.get("fpRelaxation", 1.0),
                accel=opt.get("fpAcceleration", "gmres"),
                restart=opt["gmresRestart"], psi0=psi0,
                deflate=int(opt.get("gmresDeflate", 0)),
                scales=scales if opt.get("fpNormalize", True) else None,
                aug0=aug0, return_aug=return_aug,
                remat=bool(opt.get("fpRemat", False)))
        return adjsolver.adjoint_solve(
            res_fn, state, inputs, dJdW,
            state_scales=scales, res_scales=scales,
            precond=precond,
            restart=opt["gmresRestart"], rel_tol=opt["gmresRelTol"],
            abs_tol=opt["gmresAbsTol"], max_iters=opt["gmresMaxIters"],
            psi0=psi0, deflate=int(opt.get("gmresDeflate", 0)),
            aug0=aug0, return_aug=return_aug)

    def solve_adjoint(self, state, inputs, func_name, psi0=None,
                      precond=None, aug0=None, return_aug=False):
        dJdW = jax.grad(
            lambda w: self.eval_function(func_name, w, inputs))(state)
        return self.solve_adjoint_rhs(state, inputs, dJdW, psi0=psi0,
                                      precond=precond, aug0=aug0,
                                      return_aug=return_aug)

    def _fp_step_fn(self):
        """The differentiable step map the fixed-point adjoint uses.

        fpInnerMode "fixed" (default): inner solves run as FIXED-iteration
        scan smoothers (fvsolve.fixed_inner), so plain reverse AD is the
        exact transpose of the map at ~2x forward cost and each
        (I - dG^T) product costs a few smoother sweeps — no tight
        implicit-function transpose solves. Totals stay exact at a
        converged primal: the step map's approximate-inverse terms carry
        a factor R(W*) ~ 0 (see fvsolve.solve_fixed). fpInnerScale scales
        the per-equation iteration counts relative to the primal's
        maxIters. "implicit" keeps lax.custom_linear_solve inner solves
        with tight transposes (certification-grade but ~10x costlier per
        product).
        """
        opt = self.option["adjEqnOption"]
        mode = opt.get("fpInnerMode", "fixed")
        if mode == "implicit":
            return lambda w, x: self.primal_step(w, x)
        scale = float(opt.get("fpInnerScale", 1.0))
        smoother = str(opt.get("fpInnerSmoother", "linear"))
        # FIELD-relaxation overrides for the adjoint's step map only
        # (fpRelaxFields): field relaxation is an explicit post-solve
        # blend p <- p_in + alpha (p_new - p_in), so alpha never enters a
        # residual and any alpha keeps the primal's W* an EXACT fixed
        # point of the map — the fp identity (I - dG_a^T) psibar = dJ/dW
        # holds and totals are invariant (measured: dJ/dnu rel 1.9e-9 vs
        # FD for alpha_p 0.2 and 0.6, cavity/x64). EQUATION (implicit)
        # relaxation must NOT be overridden: it changes the relaxed
        # diagonal and hence rAU, which enters the pressure/flux
        # equations, so W* stops being a fixed point of the overridden
        # map (measured: 1e-2 totals error for alpha_U 0.5 -> 0.9).
        rf_f = dict(opt.get("fpRelaxFields", {}) or {})
        if opt.get("fpRelaxEquations"):
            raise ValueError(
                "fpRelaxEquations is not supported: overriding implicit "
                "(equation) relaxation changes rAU and shifts the step "
                "map's fixed point away from the primal solution, "
                "silently corrupting totals (measured 1e-2 error). Only "
                "fpRelaxFields (explicit field relaxation) preserves the "
                "fixed point exactly.")

        import contextlib

        @contextlib.contextmanager
        def _relax_override():
            rf = self.option["relaxationFactors"]
            if not rf_f:
                yield
                return
            old_f = rf.get("fields", {})
            rf["fields"] = dict(old_f, **rf_f)
            try:
                yield
            finally:
                rf["fields"] = old_f

        def step(w, x):
            with _relax_override(), fvsolve.fixed_inner(scale, smoother):
                return self.primal_step(w, x)

        return step

    def _fp_adjoint(self) -> bool:
        """True when the solver-level fixed-point adjoint is selected AND
        this solver exposes the differentiable step map it needs."""
        if self.option["adjEqnSolMethod"] != "fixedPoint":
            return False
        if not hasattr(self, "primal_step"):
            raise NotImplementedError(
                f"{type(self).__name__} has no primal_step; "
                "adjEqnSolMethod fixedPoint is unavailable "
                "(reference parity: runFPAdj exists only for select "
                "solvers, DASimpleFoam.C:189)")
        return True

    def total_derivative(self, state, inputs, func_name, psi):
        if self._fp_adjoint():
            return adjsolver.total_derivative_fp(
                self._fp_step_fn(),
                lambda w, x: self.eval_function(func_name, w, x),
                state, inputs, psi)
        return adjsolver.total_derivative(
            lambda w, x: self._norm_residuals(w, x),
            lambda w, x: self.eval_function(func_name, w, x),
            state, inputs, psi)

    def make_forward_pc(self, state, inputs):
        """Override: PC for the FORWARD linearized system dR/dW (used by
        forward_total_derivative); None = unpreconditioned."""
        return None

    def forward_total_derivative(self, state, inputs, func_name, dx):
        opt = self.option["adjEqnOption"]
        # solve the tangent system in the SAME normalized metric as the
        # adjoint (reference normalizeJacTVecProduct, DASolver.C:1443):
        # otherwise the two AD directions converge in different norms and
        # adjoint/forward triangulation floors at the scale-imbalance
        # level (transonic phi rows: D ~ 1e-3 vs p rows 1e5 -> ~1e-5)
        scales = self.state_scales(self.geometry(inputs))
        if self._fp_adjoint():
            # tangent twin of the fp adjoint (same step map, same
            # normalized metric, same deflated GMRES)
            return adjsolver.forward_total_derivative_fp(
                self._fp_step_fn(),
                lambda w, x: self.eval_function(func_name, w, x),
                state, inputs, dx,
                rel_tol=opt.get("fpRelTol", 1e-6),
                abs_tol=opt["gmresAbsTol"],
                max_iters=opt.get("fpMaxIters", 1000),
                restart=opt["gmresRestart"],
                deflate=int(opt.get("gmresDeflate", 0)),
                scales=scales if opt.get("fpNormalize", True) else None)
        precond = None
        if opt.get("pcType", "none") != "none":
            pc_raw = self.make_forward_pc(state, inputs)
            if pc_raw is not None:
                def precond(r):  # D_W^-1 o pc_raw o D_R adapter
                    y = pc_raw(adjsolver._scale(r, scales))
                    return adjsolver._scale(y, scales, invert=True)
        return adjsolver.forward_total_derivative(
            lambda w, x: self._norm_residuals(w, x),
            lambda w, x: self.eval_function(func_name, w, x),
            state, inputs, dx,
            restart=opt.get("gmresRestart", 60),
            max_iters=opt.get("gmresMaxIters", 2000),
            precond=precond,
            state_scales=scales, res_scales=scales)

    # ------------------------------------------------------------------
    # jitted entry points (compile once per solver instance, reuse across
    # optimization iterations — the reference pays tape re-recording every
    # adjoint solve instead)
    # ------------------------------------------------------------------
    def _jitted(self, key, fn):
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        if key not in cache:
            cache[key] = jax.jit(fn)
        return cache[key]

    def run_primal(self, state, inputs):
        return self._jitted("primal", self.solve_primal)(state, inputs)

    def run_function(self, name, state, inputs):
        return self._jitted(("func", name),
                            lambda s, i: self.eval_function(name, s, i))(
                                state, inputs)

    def run_adjoint(self, func_name, state, inputs):
        """Jitted adjoint solve.

        adjEqnOption.jitMode:
          "closure" (default) — jit with ``inputs`` embedded as compile-time
            constants. On TPU, XLA's layout assignment for traced
            input-derived arrays (geometry coefficients with minor dims of
            3) picks tiled layouts padded up to 57x ((nf,3,3) tensors:
            T(4,128) pads 3,3 -> 4,128), making every FGMRES iteration
            ~6x slower (112 ms vs 18 ms per iteration at 262k cells,
            measured v5e). With constant inputs the layouts collapse to
            dense ones. Cost: recompile when the input VALUES change (one
            compile per design update in an optimization loop) — the
            closure cache is keyed on the identity of the input leaves.
          "traced" — inputs are ordinary jit arguments; one compile total,
            slower per-iteration on TPU. Use when inputs change every call.
        """
        mode = self.option["adjEqnOption"].get("jitMode", "closure")
        if mode == "traced":
            return self._jitted(("adj", func_name),
                                lambda s, i: self.solve_adjoint(s, i,
                                                                func_name))(
                                    state, inputs)
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        key = ("adjc", func_name,
               tuple(id(l) for l in jax.tree_util.tree_leaves(inputs)))
        if key not in cache:
            for k in [k for k in cache
                      if isinstance(k, tuple) and k[:2] == ("adjc",
                                                            func_name)]:
                del cache[k]
            inputs_c = jax.tree_util.tree_map(jnp.asarray, inputs)
            cache[key] = jax.jit(
                lambda s: self.solve_adjoint(s, inputs_c, func_name))
        return cache[key](state)

    def run_totals(self, func_name, state, inputs, psi):
        return self._jitted(
            ("tot", func_name),
            lambda s, i, ps: self.total_derivative(s, i, func_name, ps))(
                state, inputs, psi)

    # ------------------------------------------------------------------
    # failure detection (reference DASolver::validateStates, DASolver.C:3787)
    # ------------------------------------------------------------------
    def states_valid(self, state) -> jnp.ndarray:
        ok = jnp.asarray(True)
        for v in jax.tree_util.tree_leaves(state):
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(v)))
            ok = jnp.logical_and(ok, jnp.all(jnp.abs(v) < 1e15))
        return ok
