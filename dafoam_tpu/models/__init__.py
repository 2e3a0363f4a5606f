from dafoam_tpu.models.base import TurbulenceModel, Laminar
from dafoam_tpu.models.spalart_allmaras import (SpalartAllmaras,
                                                 SpalartAllmarasFv3)
from dafoam_tpu.models.komega_sst import KOmegaSST
from dafoam_tpu.models.komega_sst_lm import KOmegaSSTLM
from dafoam_tpu.models.ktwoeq import KEpsilon, KOmega

_TURB_REGISTRY = {
    "None": Laminar,
    "laminar": Laminar,
    "SpalartAllmaras": SpalartAllmaras,
    "SpalartAllmarasFv3": SpalartAllmarasFv3,
    "kOmegaSST": KOmegaSST,
    "kOmegaSSTLM": KOmegaSSTLM,
    "kEpsilon": KEpsilon,
    "kOmega": KOmega,
}


def make_turbulence_model(name: str, *args, **kw):
    """Run-time turbulence model selection (reference DATurbulenceModel::New,
    src/adjoint/DAModel/DATurbulenceModel/)."""
    try:
        cls = _TURB_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown turbulence model {name!r}; have {list(_TURB_REGISTRY)}")
    return cls(*args, **kw)


def register_turbulence_model(name, cls):
    _TURB_REGISTRY[name] = cls


__all__ = ["TurbulenceModel", "Laminar", "SpalartAllmaras", "KOmegaSST",
           "make_turbulence_model", "register_turbulence_model"]
