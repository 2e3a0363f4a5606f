"""Topology-optimization conjugate-heat solver.

Capability parity with the reference's DATopoChtFoam
(src/adjoint/DASolver/DATopoChtFoam/): incompressible SIMPLE with a
temperature equation plus a porosity field alphaPorosity that blocks flow
in "solid" regions — the design variable of fluid-path topology
optimization. Both pieces live in DASimpleFoam already (fvm.Sp(
alphaPorosity, U) + has_T); this subclass requires them and registers the
solver name.
"""

from dafoam_tpu.solvers.simple import DASimpleFoam


class DATopoChtFoam(DASimpleFoam):
    def __init__(self, option, topo, points):
        bcs = (option.get("boundaryConditions", {})
               if isinstance(option, dict) else option["boundaryConditions"])
        if "T" not in bcs:
            raise ValueError("DATopoChtFoam requires a T field "
                             "(boundaryConditions.T)")
        super().__init__(option, topo, points)

    def make_inputs(self):
        import jax.numpy as jnp
        inputs = super().make_inputs()
        inputs["params"].setdefault(
            "alphaPorosity", jnp.zeros((self.topo.n_cells,), self.dtype))
        return inputs
