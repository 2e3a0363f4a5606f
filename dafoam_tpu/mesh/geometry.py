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


def _cell_faces_static(topo: MeshTopology):
    """Static per-cell REAL-face count + internal-face validity mask (numpy).

    Degenerate (zero-area) padding faces of the dense-DIA layout are
    excluded from the estimated-cell-centre average (they do not exist on
    the source mesh); their pyramid contributions are zero anyway (Sf=0).
    Cached on the topology (static).
    """
    cached = getattr(topo, "_cell_faces_static", None)
    if cached is not None:
        return cached
    nc, ni = topo.n_cells, topo.n_internal
    dd = topo.dia_dense() if hasattr(topo, "dia_dense") else None
    if dd is not None:
        valid = dd[1].reshape(-1).astype(np.float64)
    else:
        valid = np.ones((ni,), dtype=np.float64)
    m = valid > 0.5
    nfc = np.zeros((nc,), dtype=np.float64)
    np.add.at(nfc, topo.owner[:ni][m], 1.0)
    np.add.at(nfc, topo.neighbour[m], 1.0)
    np.add.at(nfc, topo.owner[ni:], 1.0)
    out = (nfc, valid)
    object.__setattr__(topo, "_cell_faces_static", out)
    return out


def _cell_centres_vols(cf, sf, topo: MeshTopology, dtype):
    """Cell centres/volumes by pyramid decomposition about the estimated
    centre — scatter-free on the big face axes (face_sum_pair shifts for
    internal faces, the patch-aware plan for boundary folds)."""
    from dafoam_tpu.ops.core import (boundary_gather, boundary_scatter_add,
                                     cell_to_face_nei, cell_to_face_own,
                                     face_sum_pair)
    nc = topo.n_cells
    ni = topo.n_internal
    own_b = topo.owner[ni:]

    nfc_np, valid_np = _cell_faces_static(topo)
    wf = jnp.asarray(valid_np, dtype)[:, None]

    # estimated cell centre: average of REAL face centres
    cf_i = cf[:ni] * wf
    c_est = face_sum_pair(cf_i, cf_i, topo)
    c_est = boundary_scatter_add(c_est, cf[ni:], topo)
    c_est = c_est / jnp.asarray(nfc_np, dtype)[:, None]

    ce_own_i = cell_to_face_own(c_est, topo)       # (ni, 3)
    ce_nei_i = cell_to_face_nei(c_est, topo)
    ce_own_b = boundary_gather(c_est, topo)

    def pyr(faces_cf, faces_sf, ce, sign):
        # pyramid volume = sign * (Sf . (Cf - Cest)) / 3
        pv = sign * jnp.einsum("fi,fi->f", faces_sf, faces_cf - ce) / 3.0
        pc = 0.75 * faces_cf + 0.25 * ce
        return pv, pc

    pv_oi, pc_oi = pyr(cf[:ni], sf[:ni], ce_own_i, 1.0)
    pv_ni, pc_ni = pyr(cf[:ni], sf[:ni], ce_nei_i, -1.0)
    pv_ob, pc_ob = pyr(cf[ni:], sf[ni:], ce_own_b, 1.0)

    vol = face_sum_pair(pv_oi, pv_ni, topo)
    vol = boundary_scatter_add(vol, pv_ob, topo)
    ctr = face_sum_pair(pc_oi * pv_oi[:, None], pc_ni * pv_ni[:, None], topo)
    ctr = boundary_scatter_add(ctr, pc_ob * pv_ob[:, None], topo)

    cc = ctr / jnp.maximum(vol, 1e-36)[:, None]
    cc = jnp.where(vol[:, None] > 1e-36, cc, c_est)
    return cc, vol


def compute_geometry(points: jnp.ndarray, topo: MeshTopology) -> MeshGeometry:
    """points (n_points, 3) -> full differentiable geometry."""
    from dafoam_tpu.ops.core import (boundary_gather, cell_to_face_nei,
                                     cell_to_face_own)
    dtype = points.dtype
    cf, sf, magsf = _face_centres_areas(points, topo)
    cc, vol = _cell_centres_vols(cf, sf, topo, dtype)

    own = topo.owner
    nei = topo.neighbour
    ni = topo.n_internal

    nhat = sf / jnp.maximum(magsf, 1e-36)[:, None]

    # ---- internal faces (shift-based cell->face in the dense layout) ----
    cc_own_i = cell_to_face_own(cc, topo)
    cc_nei_i = cell_to_face_nei(cc, topo)
    d_i = cc_nei_i - cc_own_i                         # owner -> neighbour
    sfd_own = jnp.einsum("fi,fi->f", nhat[:ni], cf[:ni] - cc_own_i)
    sfd_nei = jnp.einsum("fi,fi->f", nhat[:ni], cc_nei_i - cf[:ni])
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
    d_b = cf[ni:] - boundary_gather(cc, topo)
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
