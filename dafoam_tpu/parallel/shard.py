"""SPMD sharding of solver data over a jax device mesh (GSPMD path).

The reference's MPI domain decomposition (SURVEY.md §2.4) maps to:

- one logical program, cell/face arrays sharded on a 1-D device mesh axis
  ("mesh") with jax.sharding.NamedSharding;
- XLA's SPMD partitioner inserts the halo collectives for the face
  gather / segment-sum scatter automatically (AD through them is free —
  the reference needs a differentiated MPI for this, DASolver.C:1810);
- partition locality comes from `parallel.partition.reorder_for_partitions`
  so communication is neighbor-to-neighbor on the ICI ring, not all-to-all.

An explicit shard_map halo-exchange kernel path (pallas ring RDMA) is the
planned optimization on top; this module is the correctness/scaling
baseline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices: int | None = None, axis: str = "mesh") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def mesh_axis_sharding(mesh: Mesh, axis: str = "mesh") -> NamedSharding:
    """Shard the leading (cell/face) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_case(mesh: Mesh, state: dict, inputs: dict, axis: str = "mesh"):
    """Place a (state, inputs) pair on the device mesh: cell/face-indexed
    leaves sharded on their leading axis, scalars/BC values replicated.

    Leading-axis length must divide by the mesh size for sharding; leaves
    that don't divide are replicated (small boundary arrays etc.).
    """
    n = mesh.devices.size
    shard = mesh_axis_sharding(mesh, axis)
    repl = replicated(mesh)

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] >= n and x.shape[0] % n == 0:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return (jax.tree_util.tree_map(place, state),
            jax.tree_util.tree_map(place, inputs))
