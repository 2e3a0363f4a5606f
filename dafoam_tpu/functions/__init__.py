from dafoam_tpu.functions.registry import evaluate_function

__all__ = ["evaluate_function"]
