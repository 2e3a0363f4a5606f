"""Multiple reference frames (MRF) — rotating-zone source terms.

Re-designs the reference's MRFZoneListDF / MRFZoneDF (src/adjoint/DAMisc/
MRFDF, 404 LoC — an AD-safe fork whose POINT is a runtime-mutable rotation
speed so d/d(omega) exists): here omega is just a leaf of
inputs["params"]["MRF"]["omega"], differentiable like everything else.

Semantics (incompressible, relative-velocity formulation inside the zone):
  UEqn += Omega x U                    (MRF.DDt(U), Coriolis)
  phi  -= (Omega x (Cf - origin)).Sf   (makeRelative on zone faces)
  rotating-wall BC: U_wall = Omega x (Cf - origin)

Config (option["MRF"]): {"active": True, "origin": [...], "axis": [...],
"omega": float (overridable by inputs.params.MRF.omega),
"cellZone": "all" | {"type": "cylinder", "origin", "axis", "radius",
"z1", "z2"}, "rotatingPatches": [names]}.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def omega_vector(cfg, inputs, dtype):
    om = inputs["params"].get("MRF", {}).get("omega")
    if om is None:
        om = cfg["omega"]
    ax = jnp.asarray(cfg.get("axis", [0.0, 0.0, 1.0]), dtype)
    ax = ax / jnp.maximum(jnp.linalg.norm(ax), 1e-36)
    return jnp.asarray(om, dtype) * ax


def cell_mask(cfg, geom, dtype):
    zone = cfg.get("cellZone", "all")
    if zone == "all":
        return jnp.ones_like(geom.vol)
    if zone.get("type") == "cylinder":
        o = jnp.asarray(zone["origin"], dtype)
        ax = jnp.asarray(zone["axis"], dtype)
        ax = ax / jnp.maximum(jnp.linalg.norm(ax), 1e-36)
        d = geom.cc - o
        z = d @ ax
        r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1) - z ** 2, 1e-30))
        inside = (r <= zone["radius"]) & (z >= zone.get("z1", -1e30)) \
            & (z <= zone.get("z2", 1e30))
        return inside.astype(dtype)
    raise NotImplementedError(zone)


def face_mask(cfg, geom, topo, dtype):
    """Faces whose owner is in the zone (zone-interior + its boundary)."""
    cm = cell_mask(cfg, geom, dtype)
    return cm[topo.owner]


def ddt_source(cfg, U, geom, inputs):
    """Omega x U in zone cells -> (nc,3) per-volume source (MRF.DDt)."""
    om = omega_vector(cfg, inputs, U.dtype)
    mask = cell_mask(cfg, geom, U.dtype)
    return mask[:, None] * jnp.cross(jnp.broadcast_to(om, U.shape), U)


def make_relative(cfg, phi, geom, topo, inputs):
    """phi -= (Omega x r_f) . Sf on zone faces (OpenFOAM makeRelative)."""
    om = omega_vector(cfg, inputs, phi.dtype)
    origin = jnp.asarray(cfg.get("origin", [0.0, 0.0, 0.0]), phi.dtype)
    r = geom.cf - origin
    urot = jnp.cross(jnp.broadcast_to(om, r.shape), r)
    frel = jnp.einsum("fi,fi->f", urot, geom.sf)
    return phi - face_mask(cfg, geom, topo, phi.dtype) * frel


def rotating_wall_values(cfg, geom, topo, patches, inputs, dtype):
    """{patch: (n,3) wall velocity Omega x r} for rotatingPatches
    (correctBoundaryVelocity)."""
    om = omega_vector(cfg, inputs, dtype)
    origin = jnp.asarray(cfg.get("origin", [0.0, 0.0, 0.0]), dtype)
    out = {}
    for name in patches:
        sl = topo.patch_slice(name)
        r = geom.cf[sl] - origin
        out[name] = jnp.cross(jnp.broadcast_to(om, r.shape), r)
    return out
