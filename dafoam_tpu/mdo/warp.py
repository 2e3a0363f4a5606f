"""Volume mesh warping from surface displacements (IDWarp equivalent).

The reference uses the external IDWarp (USMesh) for this
(mphys_dafoam.py:76, DAFoamWarper :804). Here: inverse-distance weighting
from moving-surface points to volume points, precomputed as a sparse-ish
dense operator over the K nearest surface points per volume point — one
matmul at warp time, exactly differentiable, MXU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class IDWarp:
    """points0: (np,3) rest volume points; surf_ids: indices of the moving
    surface points; fixed_ids: indices that must not move (outer
    boundaries). Volume points follow IDW of surface displacements with a
    decay that clamps to zero at the fixed set."""

    def __init__(self, points0: np.ndarray, surf_ids: np.ndarray,
                 fixed_ids: np.ndarray | None = None, k: int = 20,
                 power: float = 3.0):
        pts = np.asarray(points0)
        surf_ids = np.asarray(surf_ids)
        self.surf_ids = surf_ids
        npts = pts.shape[0]
        surf = pts[surf_ids]

        # K nearest surface points per volume point
        k = min(k, surf.shape[0])
        d2 = ((pts[:, None, :] - surf[None, :, :]) ** 2).sum(-1)
        nn = np.argsort(d2, axis=1)[:, :k]
        nd = np.sqrt(np.take_along_axis(d2, nn, axis=1)) + 1e-12

        w = 1.0 / nd ** power
        w = w / w.sum(axis=1, keepdims=True)

        # blend factor: 1 on the surface, 0 at/beyond the fixed boundary
        dist_surf = np.sqrt(d2.min(axis=1))
        if fixed_ids is not None and len(fixed_ids):
            dfix2 = ((pts[:, None, :] - pts[fixed_ids][None, :, :]) ** 2).sum(-1)
            dist_fix = np.sqrt(dfix2.min(axis=1)) + 1e-12
            blend = dist_fix ** 2 / (dist_fix ** 2 + dist_surf ** 2)
        else:
            blend = np.ones(npts)
        blend[surf_ids] = 1.0

        self._nn = jnp.asarray(nn)
        self._w = jnp.asarray(w * blend[:, None])
        self._npts = npts

    def __call__(self, points0: jnp.ndarray, surf_disp: jnp.ndarray):
        """surf_disp: (n_surf, 3) displacements of the surface points ->
        new volume points (np,3). Surface points get EXACTLY surf_disp."""
        d = jnp.einsum("pk,pki->pi", self._w, surf_disp[self._nn])
        d = d.at[self.surf_ids].set(surf_disp)
        return points0 + d
