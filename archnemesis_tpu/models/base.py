"""Model-parameterisation framework (state vector -> component updates).

TPU-first counterpart of the reference ``Models`` registry + ``ModelBase``
(Models/__init__.py:16-67, Models/ModelBase.py:39): each model is

- a host-side parser ``from_apr(...)`` that consumes its block of the .apr
  file and returns a static ``ModelEntry`` plus its a-priori (x0, sx-diag,
  correlation) contribution; and
- a pure function ``apply(entry, components, x_entry)`` that maps its slice
  of the (already unlogged) state vector onto the component pytrees.

Because components are immutable pytrees, 'applying' a model returns updated
copies — this is the whole of the reference's subprofretg mutation machinery,
and jacfwd differentiates through it for free (no xmap bookkeeping).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Dict, Optional, Tuple

import numpy as np


class ProfileTarget(Enum):
    TEMPERATURE = "temperature"
    GAS_VMR = "gas_vmr"
    AEROSOL = "aerosol"
    PARAH2 = "parah2"
    FCLOUD = "fcloud"
    NOT_ATMOSPHERIC = "not_atmospheric"


@dataclass(frozen=True)
class ModelEntry:
    """Static description of one parameterisation in the state vector."""

    varident: Tuple[int, int, int]
    model_id: int
    ix: int  # start index in state vector
    nx: int  # number of entries
    target: ProfileTarget
    target_idx: Optional[int] = None  # column (gas or dust index) if applicable
    extra: tuple = ()  # model-specific static parameters (hashable)


@dataclass
class AprParseResult:
    entry: ModelEntry
    x0: np.ndarray  # (nx,)
    sx_diag: np.ndarray  # (nx,) variances
    lx: np.ndarray  # (nx,) log flags
    inum: np.ndarray  # (nx,) numerical-gradient flags
    corr: Optional[np.ndarray] = None  # (nx, nx) full covariance block if set


MODEL_REGISTRY: Dict[int, "type"] = {}


def register_model(cls):
    MODEL_REGISTRY[cls.id] = cls
    return cls


def classify_target(varident, atm_gas_id, atm_iso_id, ndust):
    """Map a VARIDENT triplet to the profile it parameterises (reference
    Variables_0.classify_model_type_from_varident:598 + ForwardModel_0
    _get_ipar:2373)."""
    v0, v1, v2 = varident
    if not (v2 < 100 or 1000 <= v2 <= 1100):
        return ProfileTarget.NOT_ATMOSPHERIC, None
    if v0 == 0:
        return ProfileTarget.TEMPERATURE, None
    if v0 > 0:
        matches = [
            i
            for i, (g, s) in enumerate(zip(atm_gas_id, atm_iso_id))
            if g == v0 and s == v1
        ]
        if len(matches) != 1:
            raise ValueError(f"gas {v0} iso {v1} not uniquely in atmosphere")
        return ProfileTarget.GAS_VMR, matches[0]
    # v0 < 0: aerosol
    jcont = -v0
    if jcont > ndust:
        raise ValueError(f"aerosol {jcont} not in atmosphere (ndust={ndust})")
    return ProfileTarget.AEROSOL, jcont - 1
