from dafoam_tpu.mdo.ffd import FFDBox
from dafoam_tpu.mdo.warp import IDWarp

__all__ = ["FFDBox", "IDWarp"]
