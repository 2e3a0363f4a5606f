"""Differentiable momentum/energy source terms (DAFvSource family).

Re-designs the reference's DAFvSource hierarchy (src/adjoint/DAFvSource/:
actuatorDisk 628 LoC, actuatorLine, actuatorPoint, heatSource,
uniformPressureGradient). Sources are pure functions of (geometry, params);
actuator parameters live in inputs["params"]["fvSourcePar"][name] so they
are adjoint inputs exactly like the reference routes them through
DAGlobalVar + DAInputFvSourcePar.

Where the reference selects cells with hard cylinder tests, the TPU version
uses smooth (tanh) masks — differentiable w.r.t. actuator position/size,
which the hard selection is not.
"""

from __future__ import annotations

import jax.numpy as jnp


def _smooth_mask(x, eps):
    """1 for x<0, 0 for x>0, smooth over width eps."""
    return 0.5 * (1.0 - jnp.tanh(x / jnp.maximum(eps, 1e-12)))


def actuator_disk(geom, params, cfg, dtype):
    """Goldstein-distribution actuator disk (reference
    DAFvSourceActuatorDisk): thrust T distributed over an annular disk.

    params (differentiable, 10): [cx, cy, cz, dirx, diry, dirz,
                                  innerR, outerR, thickness, scale]
    """
    p = params
    center = p[0:3]
    direction = p[3:6] / jnp.maximum(jnp.linalg.norm(p[3:6]), 1e-12)
    r_in, r_out, thick, scale = p[6], p[7], p[8], p[9]

    d = geom.cc - center
    ax = d @ direction                      # axial coordinate
    rad = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1) - ax ** 2, 1e-30))

    eps = cfg.get("smoothness", 0.05) * jnp.maximum(r_out, 1e-12)
    m_ax = _smooth_mask(jnp.abs(ax) - 0.5 * thick, eps)
    m_r = _smooth_mask(rad - r_out, eps) * _smooth_mask(r_in - rad, eps)
    mask = m_ax * m_r

    # Goldstein: eta(r~) = r~ sqrt(1 - r~), r~ normalized radius.
    # NaN-safe: sqrt'(0) is infinite and rt clips to exactly 1 outside the
    # disk — floor the argument so the (masked-out) gradient stays finite.
    rt = jnp.clip((rad - r_in) / jnp.maximum(r_out - r_in, 1e-12),
                  0.0, 1.0 - 1e-9)
    eta = rt * jnp.sqrt(1.0 - rt)
    w = mask * eta
    # normalize so the volume integral of the source equals `scale` (total
    # thrust), as the reference does with its pseudo-disk calibration
    tot = jnp.sum(w * geom.vol)
    w = w / jnp.maximum(tot, 1e-30)
    return scale * w[:, None] * direction[None, :]


def actuator_point(geom, params, cfg, dtype):
    """Smoothed point force (reference DAFvSourceActuatorPoint):
    params: [cx, cy, cz, fx, fy, fz, radius]."""
    center, force, rad = params[0:3], params[3:6], params[6]
    d2 = jnp.sum((geom.cc - center) ** 2, -1)
    w = jnp.exp(-d2 / jnp.maximum(rad ** 2, 1e-30))
    w = w / jnp.maximum(jnp.sum(w * geom.vol), 1e-30)
    return w[:, None] * force[None, :]


def actuator_line(geom, params, cfg, dtype):
    """Rotating-line force smeared with a Gaussian kernel (reference
    DAFvSourceActuatorLine, simplified steady form): params:
    [cx,cy,cz, axx,axy,axz, radius, eps, fAxial, fTangential]."""
    center = params[0:3]
    axis = params[3:6] / jnp.maximum(jnp.linalg.norm(params[3:6]), 1e-12)
    radius, eps, f_ax, f_tan = params[6], params[7], params[8], params[9]
    d = geom.cc - center
    ax = d @ axis
    radial = d - ax[:, None] * axis[None, :]
    rad = jnp.sqrt(jnp.maximum(jnp.sum(radial * radial, -1), 1e-30))
    # annular smearing around the rotor plane (azimuthally averaged line)
    w = jnp.exp(-(ax / eps) ** 2) * jnp.exp(-((rad - radius) / eps) ** 2)
    w = w / jnp.maximum(jnp.sum(w * geom.vol), 1e-30)
    tang = jnp.cross(jnp.broadcast_to(axis, radial.shape), radial) \
        / rad[:, None]
    return w[:, None] * (f_ax * axis[None, :] + f_tan * tang)


def heat_source(geom, params, cfg, dtype):
    """Volumetric heat source in a cylinder (reference DAFvSourceHeatSource):
    params: [cx, cy, cz, axx, axy, axz, radius, length, power]. -> (nc,)"""
    center = params[0:3]
    axis = params[3:6] / jnp.maximum(jnp.linalg.norm(params[3:6]), 1e-12)
    radius, length, power = params[6], params[7], params[8]
    d = geom.cc - center
    ax = d @ axis
    rad = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1) - ax ** 2, 1e-30))
    eps = cfg.get("smoothness", 0.05) * radius
    m = _smooth_mask(jnp.abs(ax) - 0.5 * length, eps) \
        * _smooth_mask(rad - radius, eps)
    vol = jnp.sum(m * geom.vol)
    return power * m / jnp.maximum(vol, 1e-30)


def uniform_pressure_gradient(geom, params, cfg, dtype):
    """Constant momentum source (reference
    DAFvSourceUniformPressureGradient): params = gradP vector (3,)."""
    return jnp.broadcast_to(params[0:3], (geom.cc.shape[0], 3))


_REGISTRY = {
    "actuatorDisk": actuator_disk,
    "actuatorPoint": actuator_point,
    "actuatorLine": actuator_line,
    "heatSource": heat_source,
    "uniformPressureGradient": uniform_pressure_gradient,
}


def compute_fv_source(option, inputs, geom, dtype):
    """Total momentum source (nc,3) from all configured fvSource entries.

    Parameter resolution order: inputs.params.fvSourcePar[name] (adjoint
    input) else cfg['parameters'] (static)."""
    total = None
    for name, cfg in option.get("fvSource", {}).items():
        stype = cfg["type"]
        if stype == "heatSource":
            continue  # energy sources handled by the energy equation
        params = inputs["params"].get("fvSourcePar", {}).get(name)
        if params is None:
            params = jnp.asarray(cfg["parameters"], dtype)
        src = _REGISTRY[stype](geom, params, cfg, dtype)
        total = src if total is None else total + src
    return total


def compute_heat_source(option, inputs, geom, dtype):
    total = None
    for name, cfg in option.get("fvSource", {}).items():
        if cfg["type"] != "heatSource":
            continue
        params = inputs["params"].get("fvSourcePar", {}).get(name)
        if params is None:
            params = jnp.asarray(cfg["parameters"], dtype)
        src = heat_source(geom, params, cfg, dtype)
        total = src if total is None else total + src
    return total
