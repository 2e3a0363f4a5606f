from dafoam_tpu.coupling.cht import CHTCoupling
from dafoam_tpu.coupling.fsi import FSICoupling

__all__ = ["CHTCoupling", "FSICoupling"]
