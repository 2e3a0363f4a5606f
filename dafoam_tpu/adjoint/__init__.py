from dafoam_tpu.adjoint.solver import (
    adjoint_solve,
    forward_total_derivative,
    total_derivative,
)

__all__ = ["adjoint_solve", "total_derivative", "forward_total_derivative"]
