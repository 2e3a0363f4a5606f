"""Typed, differentiable design-variable injection (DAInput family).

Re-designs the reference's DAInput hierarchy (src/adjoint/DAInput/, 10
types; DAInput.H:113-117 run/size/distributed). Each type maps a FLAT
design array into leaves of the solver's `inputs` pytree; because the
pytree is the differentiation boundary, dJ/d(flat array) falls out of the
same vjp that produces dJ/d(inputs).

Config schema mirrors the reference `inputInfo` option:
  {"aero_vol_coords": {"type": "volCoord", "components": ["solver"]},
   "patchV":          {"type": "patchVelocity", "patches": ["far"],
                       "flowAxis": "x", "normalAxis": "y"},
   "beta":            {"type": "field", "fieldName": "betaFI"},
   "parameters":      {"type": "regressionPar", "modelName": "m1"}, ...}
"""

from __future__ import annotations

import jax.numpy as jnp

_AXIS = {"x": 0, "y": 1, "z": 2}


class InputRegistry:
    def __init__(self, solver, input_info: dict):
        self.solver = solver
        self.info = input_info

    def size(self, name: str) -> int:
        cfg = self.info[name]
        t = cfg["type"]
        topo = self.solver.topo
        if t == "volCoord":
            return topo.n_points * 3
        if t == "patchVelocity":
            return 2                      # [UMag, AoA_deg] (serial)
        if t == "patchVar":
            return len(cfg.get("components", [0]))
        if t == "field":
            return topo.n_cells * (3 if cfg.get("fieldType") == "vector" else 1)
        if t == "regressionPar":
            return self.solver.regression_n_params(cfg["modelName"])
        if t == "fvSourcePar":
            return len(self.solver.option["fvSource"][cfg["fvSourceName"]]
                       .get("parameters", []))
        if t == "stateVar":
            return self.solver.layout.n_states
        if t == "patchField":
            n = sum(self.solver.topo.patch(p).size for p in cfg["patches"])
            return n * (3 if cfg.get("fieldType") == "vector" else 1)
        if t == "fieldUnsteady":
            return topo.n_cells * cfg.get("nSteps", 1)
        raise NotImplementedError(t)

    def distributed(self, name: str) -> bool:
        """Serial (replicated scalar DVs) vs distributed (mesh-sized) —
        survives from the reference's serial-vs-distributed input
        distinction (DASolver.C:1790-1820)."""
        return self.info[name]["type"] in ("volCoord", "field")

    def apply(self, name: str, inputs: dict, arr: jnp.ndarray) -> dict:
        """Pure: returns a NEW inputs pytree with the DV injected."""
        cfg = self.info[name]
        t = cfg["type"]
        out = dict(inputs)
        if t == "volCoord":
            out["points"] = arr.reshape(self.solver.topo.n_points, 3)
        elif t == "patchVelocity":
            umag, aoa_deg = arr[0], arr[1]
            a = aoa_deg * jnp.pi / 180.0
            fi = _AXIS[cfg.get("flowAxis", "x")]
            ni = _AXIS[cfg.get("normalAxis", "y")]
            vec = jnp.zeros((3,), arr.dtype)
            vec = vec.at[fi].set(umag * jnp.cos(a))
            vec = vec.at[ni].set(umag * jnp.sin(a))
            bc = {k: dict(v) for k, v in inputs["bc"].items()}
            for p in cfg["patches"]:
                bc.setdefault("U", {})
                bc["U"][p] = vec
            out["bc"] = bc
            aoa = dict(inputs.get("aoa", {}))
            aoa["patchVelocity"] = arr
            out["aoa"] = aoa
        elif t == "patchVar":
            var = cfg["varName"]
            bc = {k: dict(v) for k, v in inputs["bc"].items()}
            bc.setdefault(var, {})
            for p in cfg["patches"]:
                if cfg.get("varType", "scalar") == "scalar":
                    bc[var][p] = arr[0]
                else:
                    comps = cfg.get("components", [0, 1, 2])
                    base = jnp.asarray(bc[var].get(p, jnp.zeros(3, arr.dtype)))
                    for i, c in enumerate(comps):
                        base = base.at[c].set(arr[i])
                    bc[var][p] = base
            out["bc"] = bc
        elif t == "field":
            params = dict(inputs["params"])
            fname = cfg["fieldName"]
            if cfg.get("fieldType") == "vector":
                params[fname] = arr.reshape(-1, 3)
            else:
                params[fname] = arr
            out["params"] = params
        elif t == "regressionPar":
            params = dict(inputs["params"])
            reg = dict(params.get("regressionPar", {}))
            reg[cfg["modelName"]] = arr
            params["regressionPar"] = reg
            out["params"] = params
        elif t == "fvSourcePar":
            params = dict(inputs["params"])
            fv = dict(params.get("fvSourcePar", {}))
            fv[cfg["fvSourceName"]] = arr
            params["fvSourcePar"] = fv
            out["params"] = params
        elif t == "stateVar":
            # direct state override (unsteady field inversion): carried as
            # an input leaf the solver can splice in (reference
            # DAInputStateVar)
            out["stateVar"] = arr
        elif t == "patchField":
            var = cfg["fieldName"]
            bc = {k: dict(v) for k, v in inputs["bc"].items()}
            bc.setdefault(var, {})
            off = 0
            vec = cfg.get("fieldType") == "vector"
            for pname in cfg["patches"]:
                n = self.solver.topo.patch(pname).size
                if vec:
                    bc[var][pname] = arr[off:off + 3 * n].reshape(n, 3)
                    off += 3 * n
                else:
                    bc[var][pname] = arr[off:off + n]
                    off += n
            out["bc"] = bc
        elif t == "fieldUnsteady":
            params = dict(inputs["params"])
            params[cfg["fieldName"] + "Unsteady"] = arr.reshape(
                cfg.get("nSteps", 1), -1)
            out["params"] = params
        else:
            raise NotImplementedError(t)
        return out

    def apply_all(self, inputs: dict, dvs: dict) -> dict:
        for name, arr in dvs.items():
            inputs = self.apply(name, inputs, jnp.asarray(arr,
                                                          self.solver.dtype))
        return inputs
