"""dafoam_tpu: a TPU-native discrete-adjoint CFD optimization framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of DAFoam
(reference: mdolab/dafoam). Key architectural translation (see SURVEY.md §7):

- OpenFOAM fvMesh + fvm/fvc operators  ->  static unstructured-mesh arrays +
  face gather / segment-sum scatter kernels (``dafoam_tpu.ops``).
- The reference's three CoDiPack AD builds (passive/ADR/ADF, see
  reference Allmake:29-47)  ->  ONE jitted residual function R(W, X, theta);
  ``jax.vjp`` replaces the reverse tape, ``jax.jvp`` the forward build.
- PETSc GMRES + ASM/ILU (reference src/adjoint/DALinearEqn/DALinearEqn.C:28)
  ->  matrix-free sharded GMRES in JAX (``dafoam_tpu.linalg``).
- MPI domain decomposition  ->  jax.sharding Mesh + shard_map halo exchange
  (``dafoam_tpu.parallel``).

Precision policy: discrete adjoints need tight primal convergence; the
framework computes in float64 when ``jax_enable_x64`` is on (CPU tests,
verification) and float32 (+ f64 reductions where needed) for TPU throughput.
"""

__version__ = "0.1.0"

from dafoam_tpu.option import DAOption  # noqa: F401


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax-heavy modules at
    # package import)
    if name == "make_solver":
        from dafoam_tpu.solvers import make_solver
        return make_solver
    if name == "box_hex_mesh":
        from dafoam_tpu.mesh import box_hex_mesh
        return box_hex_mesh
    if name == "read_polymesh":
        from dafoam_tpu.mesh.polymesh import read_polymesh
        return read_polymesh
    raise AttributeError(name)
