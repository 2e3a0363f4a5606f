"""Differentiable mesh geometry: a pure JAX function of point coordinates.

Re-implements OpenFOAM's ``primitiveMeshFaceCentresAndAreas`` /
``primitiveMeshCellCentresAndVols`` algorithms (triangle decomposition about
the estimated face centre; pyramid decomposition about the estimated cell
centre) in vectorized, statically-shaped JAX. Because geometry is a function
``points -> MeshGeometry``, the shape-derivative path dR/dXv (reference:
``DAInputVolCoord``, src/adjoint/DAInput/DAInputVolCoord.C) is ordinary
``jax.vjp`` through this module — no differentiated mesh library needed.

Interpolation weights / delta coefficients follow OpenFOAM
``surfaceInterpolation::makeWeights`` / ``makeNonOrthDeltaCoeffs`` so that the
FV operators in ``dafoam_tpu.ops`` reproduce the reference's discretization
(parity-critical, SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from dafoam_tpu.mesh.topology import MeshTopology


class MeshGeometry(NamedTuple):
    """All geometric mesh quantities (JAX arrays, differentiable w.r.t points).

    Face-indexed arrays cover ALL faces (internal first, then boundary).
    """

    cf: jnp.ndarray            # (nf, 3) face centres
    sf: jnp.ndarray            # (nf, 3) face area vectors (owner -> neighbour)
    magsf: jnp.ndarray         # (nf,)   face areas
    cc: jnp.ndarray            # (nc, 3) cell centres
    vol: jnp.ndarray           # (nc,)   cell volumes
    weights: jnp.ndarray       # (nf,)   linear interp weight of OWNER value
    delta_coeffs: jnp.ndarray  # (nf,)   1/|d|; boundary: 1/|cf - cc_own| proj
    nonorth_dc: jnp.ndarray    # (nf,)   non-orthogonal-corrected delta coeffs
    corr_vec: jnp.ndarray      # (nf, 3) non-orth correction vectors (internal)


def _face_centres_areas(points: jnp.ndarray, topo: MeshTopology):
    """Face centres/areas by triangle decomposition about the average point.

    Padded vertices repeat the first vertex, so their triangles are
    degenerate and contribute exactly zero to both area and centroid sums.
    """
    fv = topo.face_verts  # (nf, maxnv) numpy int
    nv = topo.face_nverts.astype(np.float64)  # (nf,)
    pts = points[fv]  # (nf, maxnv, 3)

    # estimated centre: average of the true vertices (padding repeats vertex 0
    # -> subtract the overcount).
    maxnv = fv.shape[1]
    pad_count = (maxnv - topo.face_nverts).astype(points.dtype)  # (nf,)
    sum_pts = pts.sum(axis=1) - pad_count[:, None] * points[fv[:, 0]]
    c_est = sum_pts / jnp.asarray(nv, dtype=points.dtype)[:, None]

    nxt = pts[:, list(range(1, maxnv)) + [0], :]  # next vertex, cyclic
    # triangle (p_i, p_{i+1}, c_est)
    t_sf = 0.5 * jnp.cross(nxt - pts, c_est[:, None, :] - pts)  # (nf,maxnv,3)
    t_c = (pts + nxt + c_est[:, None, :]) / 3.0

    sf = t_sf.sum(axis=1)
    # DEGENERATE (zero-area) faces exist by design in the dense-DIA layout
    # (topology.to_dia_dense padding): use the double-where safe norm so
    # d|v|/dv is 0 (not NaN) at v = 0.
    magsf_t = _safe_norm(t_sf)                # (nf, maxnv)
    sum_a = magsf_t.sum(axis=1)
    cf = (t_c * magsf_t[..., None]).sum(axis=1) / jnp.maximum(sum_a, 1e-36)[:, None]
    # degenerate (zero-area) faces fall back to the estimated centre
    cf = jnp.where(sum_a[:, None] > 1e-14, cf, c_est)
    magsf = _safe_norm(sf)
    return cf, sf, magsf


def _safe_norm(v, axis=-1):
    """|v| with zero (not NaN) gradient at v = 0."""
    s2 = jnp.sum(v * v, axis=axis)
    pos = s2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, s2, 1.0)), 0.0)


def _cell_centres_vols(cf, sf, topo: MeshTopology, dtype):
    """Cell centres/volumes by pyramid decomposition about the estimated centre."""
    nc = topo.n_cells
    own = topo.owner
    nei = topo.neighbour
    ni = topo.n_internal

    # estimated cell centre: average of face centres
    nfaces_per_cell = jnp.zeros((nc,), dtype=dtype)
    nfaces_per_cell = nfaces_per_cell.at[own].add(1.0).at[nei].add(1.0)
    c_est = jnp.zeros((nc, 3), dtype=dtype)
    c_est = c_est.at[own].add(cf).at[nei].add(cf[:ni])
    c_est = c_est / nfaces_per_cell[:, None]

    def pyr(cells, faces_cf, faces_sf, sign):
        # pyramid volume = sign * (Sf . (Cf - Cest)) / 3
        d = faces_cf - c_est[cells]
        pv = sign * jnp.einsum("fi,fi->f", faces_sf, d) / 3.0
        pc = 0.75 * faces_cf + 0.25 * c_est[cells]
        return pv, pc

    vol = jnp.zeros((nc,), dtype=dtype)
    ctr = jnp.zeros((nc, 3), dtype=dtype)

    pv, pc = pyr(own, cf, sf, 1.0)
    vol = vol.at[own].add(pv)
    ctr = ctr.at[own].add(pc * pv[:, None])
    pv, pc = pyr(nei, cf[:ni], sf[:ni], -1.0)
    vol = vol.at[nei].add(pv)
    ctr = ctr.at[nei].add(pc * pv[:, None])

    cc = ctr / jnp.maximum(vol, 1e-36)[:, None]
    cc = jnp.where(vol[:, None] > 1e-36, cc, c_est)
    return cc, vol


def compute_geometry(points: jnp.ndarray, topo: MeshTopology) -> MeshGeometry:
    """points (n_points, 3) -> full differentiable geometry."""
    dtype = points.dtype
    cf, sf, magsf = _face_centres_areas(points, topo)
    cc, vol = _cell_centres_vols(cf, sf, topo, dtype)

    own = topo.owner
    nei = topo.neighbour
    ni = topo.n_internal

    nhat = sf / jnp.maximum(magsf, 1e-36)[:, None]

    # ---- internal faces -------------------------------------------------
    d_i = cc[nei] - cc[own[:ni]]                      # owner -> neighbour
    sfd_own = jnp.einsum("fi,fi->f", nhat[:ni], cf[:ni] - cc[own[:ni]])
    sfd_nei = jnp.einsum("fi,fi->f", nhat[:ni], cc[nei] - cf[:ni])
    # OpenFOAM surfaceInterpolation::makeWeights: w = SfdNei/(SfdOwn+SfdNei),
    # weight applied to the OWNER value.
    w_i = sfd_nei / jnp.where(jnp.abs(sfd_own + sfd_nei) > 1e-36,
                              sfd_own + sfd_nei, 1.0)
    dc_i = 1.0 / jnp.maximum(jnp.linalg.norm(d_i, axis=-1), 1e-36)
    # nonOrthDeltaCoeffs: 1 / max(nhat.d, 0.05 |d|)
    nd = jnp.einsum("fi,fi->f", nhat[:ni], d_i)
    nodc_i = 1.0 / jnp.maximum(nd, 0.05 * jnp.linalg.norm(d_i, axis=-1))
    corr_i = nhat[:ni] - nodc_i[:, None] * d_i        # correction vectors

    # ---- boundary faces --------------------------------------------------
    d_b = cf[ni:] - cc[own[ni:]]
    dist_b = jnp.linalg.norm(d_b, axis=-1)
    dc_b = 1.0 / jnp.maximum(dist_b, 1e-36)
    nd_b = jnp.einsum("fi,fi->f", nhat[ni:], d_b)
    nodc_b = 1.0 / jnp.maximum(nd_b, 0.05 * dist_b)
    corr_b = nhat[ni:] - nodc_b[:, None] * d_b
    w_b = jnp.ones((topo.n_faces - ni,), dtype=dtype)

    return MeshGeometry(
        cf=cf,
        sf=sf,
        magsf=magsf,
        cc=cc,
        vol=vol,
        weights=jnp.concatenate([w_i, w_b]),
        delta_coeffs=jnp.concatenate([dc_i, dc_b]),
        nonorth_dc=jnp.concatenate([nodc_i, nodc_b]),
        corr_vec=jnp.concatenate([corr_i, corr_b]),
    )
