"""Free-form deformation (FFD) geometry parametrization.

Plays the role of pyGeo's DVGeometry (the reference composes with it at
the Python level: mphys_dafoam.py:321, pyDAFoam.py:1376-1415): a Bernstein
tensor-product control lattice embeds surface points; moving control points
moves the surface smoothly. Differentiable end-to-end in JAX, so
dXs/dDV^T products (DVGeo.totalSensitivity) are plain vjps — composed with
the solver's volCoord adjoint in one chain.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from math import comb


def _bernstein_matrix(u: np.ndarray, n: int) -> np.ndarray:
    """(npts, n) Bernstein basis values at parameters u in [0,1]."""
    u = np.clip(u, 0.0, 1.0)[:, None]
    i = np.arange(n)[None, :]
    c = np.array([comb(n - 1, k) for k in range(n)])[None, :]
    return c * u ** i * (1.0 - u) ** (n - 1 - i)


class FFDBox:
    """Axis-aligned Bernstein FFD box around a set of embedded points.

    nx, ny, nz: control points per axis. DVs are control-point
    displacements (or user-defined reductions of them, e.g. shape modes).
    """

    def __init__(self, points: np.ndarray, nx=6, ny=4, nz=2, margin=0.05,
                 bounds=None):
        pts = np.asarray(points)
        if bounds is None:
            lo = pts.min(axis=0)
            hi = pts.max(axis=0)
            pad = (hi - lo) * margin + 1e-12
            lo, hi = lo - pad, hi + pad
        else:
            lo, hi = map(np.asarray, bounds)
        self.lo, self.hi = lo, hi
        self.shape = (nx, ny, nz)

        uvw = (pts - lo) / (hi - lo)
        self.inside = np.all((uvw >= -1e-9) & (uvw <= 1 + 1e-9), axis=1)
        Bu = _bernstein_matrix(uvw[:, 0], nx)
        Bv = _bernstein_matrix(uvw[:, 1], ny)
        Bw = _bernstein_matrix(uvw[:, 2], nz)
        # embedding operator: (npts, nx*ny*nz), rows of outside points
        # zeroed so they don't move
        B = np.einsum("pi,pj,pk->pijk", Bu, Bv, Bw).reshape(pts.shape[0], -1)
        B[~self.inside] = 0.0
        self._B = jnp.asarray(B)
        # lattice rest positions (not needed for displacement mode, kept
        # for writing/debugging)
        gx = np.linspace(lo[0], hi[0], nx)
        gy = np.linspace(lo[1], hi[1], ny)
        gz = np.linspace(lo[2], hi[2], nz)
        self.lattice0 = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"),
                                 axis=-1)  # (nx,ny,nz,3)

    @property
    def n_controls(self) -> int:
        return int(np.prod(self.shape)) * 3

    def displace(self, dcp: jnp.ndarray) -> jnp.ndarray:
        """Control-point displacements (nx,ny,nz,3) or flat -> point
        displacements (npts, 3)."""
        d = jnp.reshape(dcp, (-1, 3))
        return self._B @ d

    def __call__(self, points0: jnp.ndarray, dcp: jnp.ndarray):
        return points0 + self.displace(dcp)
