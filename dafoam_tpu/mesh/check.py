"""Mesh-quality gate (reference DACheckMesh, src/adjoint/DACheckMesh/).

Computes aspect ratio, non-orthogonality, skewness, and face orientation
and compares against `checkMeshThreshold` (reference DACheckMesh.H:61-70,
option pyDAFoam.py:611-616). Called before each primal so the optimizer can
backtrack on a tangled mesh (mphys_dafoam.py:325-330 raises AnalysisError).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MeshQuality(NamedTuple):
    max_aspect_ratio: jnp.ndarray
    max_non_orth_deg: jnp.ndarray
    max_skewness: jnp.ndarray
    n_incorrect_oriented: jnp.ndarray


def mesh_quality(geom, topo) -> MeshQuality:
    ni = topo.n_internal
    own = topo.owner[:ni]
    nei = topo.neighbour

    d = geom.cc[nei] - geom.cc[own]
    magd = jnp.linalg.norm(d, axis=-1)
    nhat = geom.sf[:ni] / jnp.maximum(geom.magsf[:ni], 1e-36)[:, None]

    # non-orthogonality: angle between face normal and cell-centre vector
    cosang = jnp.einsum("fi,fi->f", nhat, d) / jnp.maximum(magd, 1e-36)
    non_orth = jnp.rad2deg(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))

    # skewness (OpenFOAM definition): |Cf - intersection| / |d|
    t = jnp.einsum("fi,fi->f", geom.cf[:ni] - geom.cc[own], nhat) \
        / jnp.maximum(jnp.einsum("fi,fi->f", d, nhat), 1e-36)
    xi = geom.cc[own] + t[:, None] * d
    skew = jnp.linalg.norm(geom.cf[:ni] - xi, axis=-1) \
        / jnp.maximum(magd, 1e-36)

    # orientation: owner->neighbour must align with Sf
    n_bad = jnp.sum(cosang <= 0.0)

    # aspect ratio (approx): per-cell max/min of face-area-based lengths
    # cheap surrogate: ratio of max to min delta over a cell's faces
    inv_d = geom.delta_coeffs[:ni]
    nc = topo.n_cells
    big = jnp.zeros((nc,)).at[own].max(1.0 / inv_d).at[nei].max(1.0 / inv_d)
    small = jnp.full((nc,), jnp.inf).at[own].min(1.0 / inv_d) \
        .at[nei].min(1.0 / inv_d)
    ar = jnp.where(jnp.isfinite(small) & (small > 0), big / small, 1.0)

    return MeshQuality(
        max_aspect_ratio=jnp.max(ar),
        max_non_orth_deg=jnp.max(non_orth) if ni else jnp.asarray(0.0),
        max_skewness=jnp.max(skew) if ni else jnp.asarray(0.0),
        n_incorrect_oriented=n_bad,
    )


def check_mesh(geom, topo, thresholds: dict) -> tuple[bool, dict]:
    q = mesh_quality(geom, topo)
    rep = {
        "maxAspectRatio": float(q.max_aspect_ratio),
        "maxNonOrth": float(q.max_non_orth_deg),
        "maxSkewness": float(q.max_skewness),
        "incorrectlyOrientedFaces": int(q.n_incorrect_oriented),
    }
    ok = (rep["maxAspectRatio"] <= thresholds["maxAspectRatio"]
          and rep["maxNonOrth"] <= thresholds["maxNonOrth"]
          and rep["maxSkewness"] <= thresholds["maxSkewness"]
          and rep["incorrectlyOrientedFaces"]
          <= thresholds["maxIncorrectlyOrientedFaces"])
    return ok, rep
