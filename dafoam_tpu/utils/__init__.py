from dafoam_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from dafoam_tpu.utils.timing import Timer

__all__ = ["save_checkpoint", "load_checkpoint", "Timer"]
