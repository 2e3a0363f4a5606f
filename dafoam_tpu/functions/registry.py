"""Objective/constraint functions over patch faces or cell sets.

Re-designs the reference's DAFunction family (src/adjoint/DAFunction/, 15
run-time-selectable types, DAFunction.H:139 calcFunction) as pure functions
of a context dict. Config schema mirrors the reference's `function` option
(dafoam/pyDAFoam.py `function` docs): each entry has `type`, a face/cell
source, `scale`, and type-specific keys.

The context ``ctx`` is assembled by the solver per evaluation:
  state      : state pytree
  geom, topo : mesh
  boundary   : {field: (nb,...) boundary-face values}
  phi        : (nf,) face flux
  nu_eff_b   : (nb,) effective viscosity at boundary (for force)
  rho        : scalar or field (rhoRef for incompressible force scaling)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _patch_mask(topo, patches):
    """(nb,) 0/1 mask of boundary faces belonging to the named patches."""
    nb = topo.n_boundary
    m = np.zeros((nb,), dtype=bool)
    for name in patches:
        sl = topo.patch_bslice(name)
        m[sl] = True
    return m


def _bface_field(ctx, var):
    b = ctx["boundary"].get(var)
    if b is None:
        raise KeyError(f"function needs boundary values of {var!r}")
    return b


# ---------------------------------------------------------------------------


def f_patch_mean(cfg, ctx):
    """Area-weighted mean of a variable over patches
    (reference DAFunctionPatchMean.C behavior)."""
    topo, geom = ctx["topo"], ctx["geom"]
    mask = jnp.asarray(_patch_mask(topo, cfg["patches"]), geom.magsf.dtype)
    w = geom.magsf[topo.n_internal:] * mask
    v = _bface_field(ctx, cfg["varName"])
    if v.ndim == 2:
        v = v[:, cfg.get("component", 0)]
    return jnp.sum(w * v) / jnp.maximum(jnp.sum(w), 1e-36)


def f_variable_vol_sum(cfg, ctx):
    """sum(scale * var^power * V^(isSquare? )) over cell zones — reference
    DAFunctionVariableVolSum (field-inversion regularization etc.)."""
    geom = ctx["geom"]
    v = ctx["state"].get(cfg["varName"])
    if v is None:
        v = ctx.get("aux", {})[cfg["varName"]]
    if v.ndim == 2:
        v = v[:, cfg.get("component", 0)]
    p = cfg.get("index", 1)  # power, reference uses `index`
    val = v ** p
    if cfg.get("isSquare", 0):
        val = val ** 2
    if cfg.get("multiplyVol", 1):
        val = val * geom.vol
    if cfg.get("divByTotalVol", 0):
        return jnp.sum(val) / jnp.sum(geom.vol)
    return jnp.sum(val)


def f_mass_flow_rate(cfg, ctx):
    topo = ctx["topo"]
    mask = jnp.asarray(_patch_mask(topo, cfg["patches"]), ctx["phi"].dtype)
    phi_b = ctx["phi"][topo.n_internal:]
    rho = ctx.get("rho_b", 1.0)
    return jnp.sum(mask * rho * phi_b)


def f_total_pressure(cfg, ctx):
    """Mass-flow-averaged total pressure over patches (incompressible:
    p0 = rho*(p + 0.5|U|^2), reference DAFunctionTotalPressure)."""
    topo, geom = ctx["topo"], ctx["geom"]
    mask = jnp.asarray(_patch_mask(topo, cfg["patches"]), geom.magsf.dtype)
    p_b = _bface_field(ctx, "p")
    U_b = _bface_field(ctx, "U")
    rho = ctx.get("rho_ref", 1.0)
    p0 = rho * (p_b + 0.5 * jnp.sum(U_b * U_b, axis=-1))
    w = jnp.abs(ctx["phi"][topo.n_internal:]) * mask
    return jnp.sum(w * p0) / jnp.maximum(jnp.sum(w), 1e-36)


def _wall_force(cfg, ctx):
    """Per-face force vector on wall patches: pressure + viscous.

    fp = Sf * rho * (p - pRef);  fv = -rho nuEff (grad U + grad U^T) . Sf
    (reference DAFunctionForce uses devRhoReff the same way). pRef defaults
    to 0 (gauge pressure, matching the reference); set cfg["pRef"] to remove
    the gauge dependence on non-closed patch selections."""
    topo, geom = ctx["topo"], ctx["geom"]
    ni = topo.n_internal
    mask = jnp.asarray(_patch_mask(topo, cfg["patches"]), geom.magsf.dtype)
    p_b = _bface_field(ctx, "p")
    rho = ctx.get("rho_ref", 1.0)
    p_ref = cfg.get("pRef", 0.0)
    fp = geom.sf[ni:] * (rho * (p_b - p_ref))[:, None]
    fv = 0.0
    if "gradU_b" in ctx:
        gradU_b = ctx["gradU_b"]  # (nb,3,3), grad[i,j]=dU_j/dx_i
        nu_b = ctx.get("nu_eff_b", 0.0)
        tau = gradU_b + jnp.swapaxes(gradU_b, -1, -2)
        # rho may be a scalar (incompressible rho_ref) or a per-face
        # field (compressible solvers) — combine before broadcasting
        rnu = jnp.broadcast_to(jnp.asarray(rho * nu_b), tau.shape[:1])
        fv = -rnu[:, None] * jnp.einsum("fij,fi->fj", tau, geom.sf[ni:])
    return (fp + fv) * mask[:, None]


def f_force(cfg, ctx):
    f = _wall_force(cfg, ctx)
    mode = cfg.get("directionMode", "fixedDirection")
    if mode == "fixedDirection":
        d = jnp.asarray(cfg["direction"], f.dtype)
    elif mode in ("parallelToFlow", "normalToFlow"):
        # AoA from the patchVelocity input (reference pyDAFoam.py:131-137):
        # drag parallel to flow, lift normal to it, in the flowAxis plane
        aoa = ctx["aoa_rad"]
        flow, normal = cfg.get("flowAxisIndex", 0), cfg.get("normalAxisIndex", 1)
        d = jnp.zeros((3,), f.dtype)
        if mode == "parallelToFlow":
            d = d.at[flow].set(jnp.cos(aoa)).at[normal].set(jnp.sin(aoa))
        else:
            d = d.at[flow].set(-jnp.sin(aoa)).at[normal].set(jnp.cos(aoa))
    else:
        raise NotImplementedError(mode)
    return jnp.sum(f @ d)


def f_moment(cfg, ctx):
    topo, geom = ctx["topo"], ctx["geom"]
    f = _wall_force(cfg, ctx)
    center = jnp.asarray(cfg.get("center", [0.0, 0.0, 0.0]), f.dtype)
    axis = jnp.asarray(cfg["axis"], f.dtype)
    r = geom.cf[topo.n_internal:] - center
    m = jnp.cross(r, f)
    return jnp.sum(m @ axis)


def f_field_max(cfg, ctx):
    """Differentiable max via KS aggregation (reference DAFunctionFieldMax /
    DATimeOp timeOpMaxMode:KS pattern)."""
    v = ctx["state"].get(cfg["varName"], ctx.get("aux", {}).get(cfg["varName"]))
    if v.ndim == 2:
        v = v[:, cfg.get("component", 0)]
    rho = cfg.get("coeffKS", 20.0)
    m = jnp.max(v)
    return m + jnp.log(jnp.sum(jnp.exp(rho * (v - m)))) / rho


def f_residual_norm(cfg, ctx):
    """L2 norm of selected residuals (reference DAFunctionResidualNorm,
    used to train field-inversion models on residual minimization)."""
    res = ctx["residuals"]
    tot = 0.0
    for name in cfg.get("resWeight", {k: 1.0 for k in res}):
        w = cfg.get("resWeight", {}).get(name, 1.0)
        r = res[name.replace("Res", "")] if name.endswith("Res") else res[name]
        tot = tot + w * jnp.sum(r * r)
    return tot


def f_variance(cfg, ctx):
    """Data-misfit variance for field inversion (reference DAFunctionVariance):
    sum((var - data)^2)/N over cells or probe points."""
    mode = cfg.get("mode", "field")
    var_name = cfg["varName"]
    v = ctx["state"].get(var_name, ctx.get("aux", {}).get(var_name))
    data = ctx["data"][cfg["varName"] + "Data"]
    if cfg.get("varType") == "vector" or (v is not None and v.ndim == 2):
        comps = cfg.get("components", [0, 1, 2])
        diff = (v[:, comps] - data[:, comps]).reshape(-1)
    else:
        diff = v - data
    if mode == "probePoint" and "probe_weights" in ctx:
        diff = diff * ctx["probe_weights"]
    n = diff.shape[0]
    return jnp.sum(diff * diff) / n


def f_wall_heat_flux(cfg, ctx):
    """Integrated wall heat flux; incompressible: q = Cp*rho*alphaEff*dT/dn
    (reference DAFunctionWallHeatFlux)."""
    topo, geom = ctx["topo"], ctx["geom"]
    ni = topo.n_internal
    mask = jnp.asarray(_patch_mask(topo, cfg["patches"]), geom.magsf.dtype)
    q = ctx["wall_heat_flux_b"]
    if cfg.get("byUnitArea", 1):
        area = jnp.sum(geom.magsf[ni:] * mask)
        return jnp.sum(q * geom.magsf[ni:] * mask) / jnp.maximum(area, 1e-36)
    return jnp.sum(q * geom.magsf[ni:] * mask)


def f_von_mises_ks(cfg, ctx):
    """KS-aggregated von Mises stress (reference DAFunctionVonMisesStressKS):
    sigmaKS = log(sum(exp(coeffKS * sigma_vm))) / coeffKS."""
    vm = ctx["aux"]["vonMises"]
    rho = cfg.get("coeffKS", 2e-3)
    m = jnp.max(vm)
    return m + jnp.log(jnp.sum(jnp.exp(rho * (vm - m)))) / rho


def f_mesh_quality_ks(cfg, ctx):
    """KS-aggregated face non-orthogonality (reference
    DAFunctionMeshQualityKS) — differentiable mesh-quality constraint."""
    geom, topo = ctx["geom"], ctx["topo"]
    ni = topo.n_internal
    own = topo.owner[:ni]
    d = geom.cc[topo.neighbour] - geom.cc[own]
    nhat = geom.sf[:ni] / jnp.maximum(geom.magsf[:ni], 1e-36)[:, None]
    cosang = jnp.einsum("fi,fi->f", nhat, d) \
        / jnp.maximum(jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-36)),
                      1e-36)
    metric = jnp.rad2deg(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    rho = cfg.get("coeffKS", 0.1)
    m = jnp.max(metric)
    return m + jnp.log(jnp.sum(jnp.exp(rho * (metric - m)))) / rho



def f_total_pressure_ratio(cfg, ctx):
    """Mass-flow-averaged total-pressure ratio outlet/inlet (compressible;
    reference DAFunctionTotalPressureRatio): p0 = p (1 + (g-1)/2 M^2)^(g/(g-1))."""
    topo, geom = ctx["topo"], ctx["geom"]
    gam = cfg.get("gamma", 1.4)
    p_b = _bface_field(ctx, "p")
    T_b = _bface_field(ctx, "T")
    U_b = _bface_field(ctx, "U")
    R = cfg.get("R", 287.0)
    c2 = gam * R * T_b
    M2 = jnp.sum(U_b * U_b, -1) / jnp.maximum(c2, 1e-36)
    p0 = p_b * (1.0 + 0.5 * (gam - 1.0) * M2) ** (gam / (gam - 1.0))

    def avg(patches):
        mask = jnp.asarray(_patch_mask(topo, patches), p_b.dtype)
        w = jnp.abs(ctx["phi"][topo.n_internal:]) * mask
        return jnp.sum(w * p0) / jnp.maximum(jnp.sum(w), 1e-36)

    return avg(cfg["outletPatches"]) / jnp.maximum(avg(cfg["inletPatches"]),
                                                   1e-36)


def f_total_temperature_ratio(cfg, ctx):
    """Mass-flow-averaged total-temperature ratio outlet/inlet (reference
    DAFunctionTotalTemperatureRatio): T0 = T (1 + (g-1)/2 M^2)."""
    topo = ctx["topo"]
    gam = cfg.get("gamma", 1.4)
    T_b = _bface_field(ctx, "T")
    U_b = _bface_field(ctx, "U")
    R = cfg.get("R", 287.0)
    M2 = jnp.sum(U_b * U_b, -1) / jnp.maximum(gam * R * T_b, 1e-36)
    T0 = T_b * (1.0 + 0.5 * (gam - 1.0) * M2)

    def avg(patches):
        mask = jnp.asarray(_patch_mask(topo, patches), T_b.dtype)
        w = jnp.abs(ctx["phi"][topo.n_internal:]) * mask
        return jnp.sum(w * T0) / jnp.maximum(jnp.sum(w), 1e-36)

    return avg(cfg["outletPatches"]) / jnp.maximum(avg(cfg["inletPatches"]),
                                                   1e-36)


def f_location(cfg, ctx):
    """Differentiable location of a field extremum via softmax-weighted
    coordinates (reference DAFunctionLocation, e.g. maxRadius for
    centrifugal blades)."""
    geom = ctx["geom"]
    v = ctx["state"].get(cfg["varName"],
                         ctx.get("aux", {}).get(cfg["varName"]))
    if v is not None and v.ndim == 2:
        v = jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1), 1e-36))
    mode = cfg.get("mode", "maxRadius")
    axis = jnp.asarray(cfg.get("axis", [0.0, 0.0, 1.0]), geom.cc.dtype)
    center = jnp.asarray(cfg.get("center", [0.0, 0.0, 0.0]), geom.cc.dtype)
    d = geom.cc - center
    z = d @ axis
    r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1) - z ** 2, 1e-36))
    rho_ks = cfg.get("coeffKS", 20.0)
    w = jax.nn.softmax(rho_ks * v)
    if mode == "maxRadius":
        return jnp.sum(w * r)
    raise NotImplementedError(mode)


_REGISTRY = {
    "patchMean": f_patch_mean,
    "variableVolSum": f_variable_vol_sum,
    "massFlowRate": f_mass_flow_rate,
    "totalPressure": f_total_pressure,
    "force": f_force,
    "moment": f_moment,
    "fieldMax": f_field_max,
    "residualNorm": f_residual_norm,
    "variance": f_variance,
    "wallHeatFlux": f_wall_heat_flux,
    "vonMisesStressKS": f_von_mises_ks,
    "meshQualityKS": f_mesh_quality_ks,
    "totalPressureRatio": f_total_pressure_ratio,
    "totalTemperatureRatio": f_total_temperature_ratio,
    "location": f_location,
}


def evaluate_function(cfg: dict, ctx: dict):
    """Evaluate one `function` config entry -> scalar (times `scale`)."""
    ftype = cfg["type"]
    if ftype not in _REGISTRY:
        raise NotImplementedError(f"function type {ftype!r}")
    return _REGISTRY[ftype](cfg, ctx) * cfg.get("scale", 1.0)
