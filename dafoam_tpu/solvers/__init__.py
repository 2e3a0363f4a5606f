from dafoam_tpu.solvers.base import DASolverBase, PrimalInfo
from dafoam_tpu.solvers.scalar_transport import DAScalarTransportFoam
from dafoam_tpu.solvers.heat_transfer import DAHeatTransferFoam
from dafoam_tpu.solvers.simple import DASimpleFoam
from dafoam_tpu.solvers.pimple import DAPimpleFoam
from dafoam_tpu.solvers.solid import DASolidDisplacementFoam
from dafoam_tpu.solvers.rho_simple import (DARhoSimpleFoam, DARhoSimpleCFoam,
                                            DATurboFoam)
from dafoam_tpu.solvers.topo_cht import DATopoChtFoam
from dafoam_tpu.solvers.rho_pimple import DARhoPimpleFoam
from dafoam_tpu.solvers.pimple_dym import DAPimpleDyMFoam
from dafoam_tpu.solvers.inter import DAInterFoam
from dafoam_tpu.solvers.irk_pimple import DAIrkPimpleFoam
from dafoam_tpu.solvers.hisa import DAHisaFoam
from dafoam_tpu.solvers.time_spectral import DATimeSpectralScalarFoam

_SOLVER_REGISTRY = {}


def register_solver(cls):
    _SOLVER_REGISTRY[cls.__name__] = cls
    return cls


def make_solver(option, topo, points):
    """Run-time solver selection — the reference's
    DASolver::New(solverName) (addToRunTimeSelectionTable pattern)."""
    from dafoam_tpu.option import DAOption
    opt = option if isinstance(option, DAOption) else DAOption(option)
    name = opt["solverName"]
    # reference option surface: unsteadyAdjoint mode "hybrid" selects the
    # time-spectral (harmonic balance) formulation for solvers that have
    # one (pyDAFoam.py:398-409 declares the mode; solvers/time_spectral
    # implements it)
    if opt["unsteadyAdjoint"].get("mode") == "hybrid":
        ts_map = {"DAScalarTransportFoam": "DATimeSpectralScalarFoam"}
        if name in ts_map:
            name = ts_map[name]
        elif name not in set(ts_map.values()):
            raise NotImplementedError(
                f"unsteadyAdjoint mode 'hybrid' (time-spectral) is "
                f"implemented for {sorted(ts_map)} only, not {name!r}")
    if name not in _SOLVER_REGISTRY:
        raise KeyError(f"unknown solver {name!r}; have {list(_SOLVER_REGISTRY)}")
    layout = opt.get("meshFaceLayout", "auto")
    if layout != "canonical" and topo.dia_dense() is None:
        import jax

        if layout == "diaDense" or (layout == "auto"
                                    and jax.default_backend() == "tpu"):
            from dafoam_tpu.mesh.topology import to_dia_dense

            dense = to_dia_dense(topo)
            if dense is not None:
                topo = dense
            elif layout == "diaDense":
                raise ValueError("mesh is not banded; diaDense layout "
                                 "unavailable (use meshFaceLayout=canonical)")
    return _SOLVER_REGISTRY[name](opt, topo, points)


for _c in (DAScalarTransportFoam, DAHeatTransferFoam, DASimpleFoam,
           DAPimpleFoam, DASolidDisplacementFoam, DARhoSimpleFoam,
           DARhoSimpleCFoam, DATurboFoam, DATopoChtFoam, DARhoPimpleFoam,
           DAPimpleDyMFoam, DAInterFoam, DAIrkPimpleFoam, DAHisaFoam,
           DATimeSpectralScalarFoam):
    register_solver(_c)

__all__ = ["DASolverBase", "PrimalInfo", "DAScalarTransportFoam",
           "DAHeatTransferFoam", "DASimpleFoam", "make_solver",
           "register_solver"]
