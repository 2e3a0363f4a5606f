from dafoam_tpu.coupling.cht import CHTCoupling

__all__ = ["CHTCoupling"]
