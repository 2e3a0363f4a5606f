from dafoam_tpu.linalg.krylov import cg, bicgstab, gmres, SolveInfo

__all__ = ["cg", "bicgstab", "gmres", "SolveInfo"]
