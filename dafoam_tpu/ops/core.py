"""Gather/scatter primitives: the TPU substrate for unstructured FV.

Every OpenFOAM ``fvm``/``fvc`` operator reduces to (1) gather cell values to
faces, (2) a per-face flux computation, (3) scatter-add face contributions
back to cells. On TPU the scatter is ``jax.ops.segment_sum``; internal faces
are kept sorted by owner (canonical upper-triangular order, see
``mesh.topology``) so the owner-side scatter can use ``indices_are_sorted``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add(vals: jnp.ndarray, cells, n_cells: int, sorted: bool = False):
    """sum_{f: cells[f]==c} vals[f]  ->  (n_cells, ...).

    NOTE: the `indices_are_sorted` hint is deliberately NOT forwarded —
    under GSPMD the hint applies per-shard after partitioning and XLA can
    exploit it incorrectly for face arrays sharded independently of cells,
    silently corrupting the scatter (observed as sharded-primal divergence
    in test_sharding)."""
    return jax.ops.segment_sum(vals, cells, num_segments=n_cells)


def surface_sum(vals_internal, vals_boundary, topo, active_b=None):
    """OpenFOAM surfaceSum: per-cell sum of face values with owner +, nei -.

    ``vals_internal``: (ni, ...) per-internal-face values;
    ``vals_boundary``: (nb, ...) per-boundary-face values (outward sign).
    ``active_b``: optional (nb,) 0/1 mask (0 for empty patches).
    """
    ni = topo.n_internal
    out = scatter_add(vals_internal, topo.owner[:ni], topo.n_cells, sorted=True)
    out = out - scatter_add(vals_internal, topo.neighbour, topo.n_cells)
    if vals_boundary is not None:
        if active_b is not None:
            shp = (-1,) + (1,) * (vals_boundary.ndim - 1)
            vals_boundary = vals_boundary * active_b.reshape(shp)
        out = out + scatter_add(vals_boundary, topo.owner[ni:], topo.n_cells)
    return out


def gather_own_nei(psi: jnp.ndarray, topo):
    """Cell field -> (owner values on all faces, neighbour values on internal)."""
    return psi[topo.owner], psi[topo.neighbour]
