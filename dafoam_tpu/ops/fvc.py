"""Explicit finite-volume operators (OpenFOAM ``fvc::`` namespace).

All functions are pure: (geometry, cell field, boundary face values) -> field.
Boundary values come from ``dafoam_tpu.ops.bc`` so the chain differentiates
end-to-end with ``jax.vjp``.
"""

from __future__ import annotations

import jax.numpy as jnp

from dafoam_tpu.ops.core import scatter_add, surface_sum


def _w(geom, topo, like):
    w = geom.weights[: topo.n_internal]
    return w[:, None] if like.ndim == 2 else w


def interpolate(geom, topo, psi: jnp.ndarray, psi_b: jnp.ndarray) -> jnp.ndarray:
    """Linear (central) face interpolation; boundary faces take psi_b.
    Uses the scatter-free cell->face primitives so its reverse-mode
    (face->cell accumulation) is a gather too."""
    from dafoam_tpu.ops.core import cell_to_face_nei, cell_to_face_own
    ni = topo.n_internal
    w = geom.weights[:ni].reshape((-1,) + (1,) * (psi.ndim - 1))
    own = cell_to_face_own(psi, topo)
    nei = cell_to_face_nei(psi, topo)
    return jnp.concatenate([w * own + (1.0 - w) * nei, psi_b], axis=0)


def snGrad(geom, topo, psi, sng_b, corrected=False, grad_psi=None,
           grad_psi_b=None):
    """Surface-normal gradient on internal faces + given boundary snGrad.

    corrected=True adds the non-orthogonal correction
    k_f . interp(grad psi) (OpenFOAM correctedSnGrad).
    """
    ni = topo.n_internal
    own = topo.owner[:ni]
    nei = topo.neighbour
    from dafoam_tpu.ops.core import cell_to_face_nei, cell_to_face_own
    if corrected:
        dc = geom.nonorth_dc[:ni]
    else:
        dc = geom.delta_coeffs[:ni]
    d = dc.reshape((-1,) + (1,) * (psi.ndim - 1))
    g = d * (cell_to_face_nei(psi, topo) - cell_to_face_own(psi, topo))
    if corrected:
        assert grad_psi is not None
        gf = interpolate(geom, topo, grad_psi, grad_psi_b)[:ni]
        # psi scalar: grad (nc,3) -> corr (ni,) ; psi vector: grad (nc,3,3)
        corr = jnp.einsum("fi,fi...->f...", geom.corr_vec[:ni], gf)
        g = g + corr
    return jnp.concatenate([g, sng_b], axis=0)


def grad(geom, topo, psi: jnp.ndarray, psi_b: jnp.ndarray) -> jnp.ndarray:
    """Gauss gradient: (1/V) sum_f Sf (x) psi_f.

    scalar -> (nc,3); vector -> (nc,3,3) with grad[c,i,j] = d psi_j / d x_i.
    """
    fvals = interpolate(geom, topo, psi, psi_b)
    ni = topo.n_internal
    if psi.ndim == 1:
        gi = geom.sf[:ni] * fvals[:ni, None]
        gb = geom.sf[ni:] * fvals[ni:, None]
        out = surface_sum(gi, gb, topo)
        return out / geom.vol[:, None]
    gi = geom.sf[:ni, :, None] * fvals[:ni, None, :]
    gb = geom.sf[ni:, :, None] * fvals[ni:, None, :]
    out = surface_sum(gi, gb, topo)
    return out / geom.vol[:, :, None] if geom.vol.ndim == 2 else out / geom.vol[:, None, None]


def div_surface(geom, topo, phi_f: jnp.ndarray) -> jnp.ndarray:
    """fvc::div of a surface (face) flux field: (1/V) * surfaceSum(phi)."""
    ni = topo.n_internal
    extra = (1,) * (phi_f.ndim - 1)
    out = surface_sum(phi_f[:ni], phi_f[ni:], topo)
    return out / geom.vol.reshape((-1,) + extra)


def div(geom, topo, phi_f, psi, psi_b):
    """Explicit convection fvc::div(phi, psi) with linear interpolation."""
    fvals = interpolate(geom, topo, psi, psi_b)
    t = phi_f.reshape((-1,) + (1,) * (psi.ndim - 1)) * fvals
    return div_surface(geom, topo, t)


def div_tensor(geom, topo, T, T_b):
    """fvc::div of a cell tensor field: (1/V) sum_f Sf . T_f -> (nc,3)."""
    Tf = interpolate(geom, topo, T, T_b)
    ni = topo.n_internal
    fi = jnp.einsum("fi,fij->fj", geom.sf[:ni], Tf[:ni])
    fb = jnp.einsum("fi,fij->fj", geom.sf[ni:], Tf[ni:])
    out = surface_sum(fi, fb, topo)
    return out / geom.vol[:, None]


def flux(geom, topo, U, U_b):
    """fvc::flux(U) = Sf & interp(U) on every face -> (nf,)."""
    Uf = interpolate(geom, topo, U, U_b)
    return jnp.einsum("fi,fi->f", geom.sf, Uf)


def average_to_faces(geom, topo, psi, psi_b):
    return interpolate(geom, topo, psi, psi_b)


def cell_sum(geom, vals):
    return jnp.sum(vals * geom.vol)


def reconstruct(geom, topo, F_face):
    """OpenFOAM fvc::reconstruct: cell vector field from face fluxes.

    r_c = [sum_f (Sf Sf^T)/|Sf|]^-1  sum_f (Sf/|Sf|) F_f
    (used by interFoam's buoyancy/pressure force reconstruction,
    reference DAInterFoam/UEqnInter.H:13 / pEqnInter.H:64). Degenerate
    (zero-area) dense-layout faces contribute nothing.
    """
    from dafoam_tpu.ops.core import boundary_scatter_add, face_sum_pair
    ni = topo.n_internal
    msf = jnp.where(geom.magsf > 0.0, geom.magsf, 1.0)
    sf_n = geom.sf / msf[:, None]
    # G = sum_f Sf (x) Sf/|Sf| : (nc, 3, 3), both owner and neighbour rows
    outer = jnp.einsum("fi,fj->fij", geom.sf, sf_n)
    Gi = face_sum_pair(outer[:ni].reshape(ni, 9),
                       outer[:ni].reshape(ni, 9), topo).reshape(-1, 3, 3)
    G = boundary_scatter_add(Gi.reshape(-1, 9), outer[ni:].reshape(-1, 9),
                             topo).reshape(-1, 3, 3)
    rhs_f = sf_n * F_face[:, None]
    ri = face_sum_pair(rhs_f[:ni], rhs_f[:ni], topo)
    r = boundary_scatter_add(ri, rhs_f[ni:], topo)
    # regularize to keep 3x3 invertible on 2-D (empty-direction) meshes
    G = G + 1e-30 * jnp.eye(3, dtype=F_face.dtype)
    return jnp.linalg.solve(G, r[..., None])[..., 0]
