from dafoam_tpu.ops import bc, fvc, fvm
from dafoam_tpu.ops.fvmatrix import FvMatrix

__all__ = ["bc", "fvc", "fvm", "FvMatrix"]
