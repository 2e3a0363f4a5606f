"""Wall distance.

The reference forces a frozen meshWave wall distance for adjoint accuracy
(option forceMeshWaveFrozen / wallDist method, src/adjoint/DAMisc/
meshWaveFrozen, DASolver.C:4433): d is computed once and NOT differentiated.
Here the frozen field is an exact nearest-wall-face distance computed at
preprocessing (host numpy, chunked), which upper-bounds meshWave's accuracy.
"""

from __future__ import annotations

import numpy as np


def wall_face_mask(topo, kinds=("wall",), names=()):
    m = np.zeros((topo.n_faces - topo.n_internal,), dtype=bool)
    for p in topo.patches:
        if p.kind in kinds or p.name in names:
            s = p.start - topo.n_internal
            m[s:s + p.size] = True
    return m


def nearest_wall_distance(cc, cf_boundary, mask, chunk=4096):
    """Exact nearest distance from each cell centre to masked boundary
    face centres. cc (nc,3), cf_boundary (nb,3) numpy arrays."""
    wall_pts = np.asarray(cf_boundary)[mask]
    cc = np.asarray(cc)
    if wall_pts.shape[0] == 0:
        return np.full((cc.shape[0],), 1e10)
    out = np.empty((cc.shape[0],))
    for s in range(0, cc.shape[0], chunk):
        blk = cc[s:s + chunk]
        d2 = ((blk[:, None, :] - wall_pts[None, :, :]) ** 2).sum(-1)
        out[s:s + chunk] = np.sqrt(d2.min(axis=1))
    return out


def compute_wall_distance(geom, topo, kinds=("wall",), names=()):
    mask = wall_face_mask(topo, kinds, names)
    cf_b = np.asarray(geom.cf)[topo.n_internal:]
    return nearest_wall_distance(np.asarray(geom.cc), cf_b, mask)
