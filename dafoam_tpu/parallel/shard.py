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


def shard_case(mesh: Mesh, state: dict, inputs: dict, axis: str = "mesh",
               n_cells: int | None = None):
    """Place a (state, inputs) pair on the device mesh: CELL-indexed leaves
    sharded on their leading axis, everything else replicated.

    Policy note: only the cell axis is sharded. ROOT CAUSE (bisected in
    round 2): XLA:CPU's SPMD partitioner miscompiles the p-equation
    assembly when a *computed* face-sized array (geom.magsf) is
    partitioned on the face axis inside the full residual graph — every
    sub-expression in isolation is bit-exact, an explicit replication
    constraint on magsf fixes the full graph, and a face-shard constraint
    reproduces err O(10). A partitioner/fusion interaction bug, not a
    semantics error in our ops. The explicit shard_map + ppermute halo
    path (parallel.halo.HaloMatvec) has no partitioner decisions at all
    and is the high-performance multi-chip route for the Krylov matvecs.
    """
    n = mesh.devices.size
    shard = mesh_axis_sharding(mesh, axis)
    repl = replicated(mesh)
    if n_cells is None:
        # infer: the smallest leading dim among vol-sized state leaves
        cand = [x.shape[0] for x in jax.tree_util.tree_leaves(state)
                if hasattr(x, "shape") and x is not None and
                getattr(x, "ndim", 0) >= 1]
        n_cells = min(cand) if cand else -1

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n_cells and n_cells % n == 0:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return (jax.tree_util.tree_map(place, state),
            jax.tree_util.tree_map(place, inputs))


def shard_solver(solver, n_devices: int | None = None, axis: str = "mesh"):
    """PRODUCTION multi-chip opt-in: route every LDU matvec of this
    solver's topology — primal smoother iterations (fvsolve/cg/bicgstab),
    the custom_linear_solve transposes, and the adjoint FGMRES/fixed-point
    products — through the explicit shard_map+ppermute halo path
    (parallel.halo.HaloMatvec via ops.fvmatrix.matvec_fn dispatch), so the
    solve-phase communication is ppermutes proportional to the partition
    cut and the face-coefficient compute is sharded per device.

    The solver must have been built on a partition-reordered topology
    (parallel.partition.reorder_for_partitions with the same device
    count). Returns (mesh, halo_matvec); `halo_matvec.plan.cut_faces` is
    the comm-volume diagnostic. Reference analog: decomposePar +
    processor-patch exchanges inside every fvMatrix solve
    (pyDAFoam.py:1454-1480, DAJacCon.H:100-109).

    Call BEFORE the first run_* invocation: matvec dispatch happens at
    trace time, and already-jitted executables keep their original path.
    """
    from dafoam_tpu.parallel import halo

    mesh = device_mesh(n_devices, axis)
    hm = halo.activate(solver.topo, mesh, axis)
    return mesh, hm
