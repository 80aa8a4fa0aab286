"""Non-LTE atmospheric-emission tables (fluorescence / chemical / photolysis).

TPU-native counterpart of the reference ``Emissions_0`` class
(``Emissions_0.py:52``): per-emission look-up tables of emission rates
K(NWAVE, NT, NEM) plus reaction-rate coefficients RATE_COEFF(NT, NEM), all on
a shared (wave, temperature) grid. Table values are traced leaves so
retrievals can differentiate through them; emission types and gas identities
are static metadata.
"""

from __future__ import annotations

from typing import Any, Tuple

from archnemesis_tpu.enums import EmissionType, WaveUnit
from archnemesis_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class EmissionTables:
    """Stacked emission look-up tables for NEM atmospheric emissions.

    Mirrors the reference table layout (``Emissions_0.py:92-103``):
      - K: fluorescence g-factors [photon molecule-1 s-1 (cm-1)-1] or
        chemical/photolysis strengths [photon molecule-1 (cm-1)-1]
      - RATE_COEFF: reaction-rate coefficient [s-1] (single-species
        emissions), used only for CHEMICAL/PHOTOLYSIS types
      - DIST_REF: stellar distance of tabulation (AU), used to rescale
        fluorescence/photolysis rates to the actual planet-star distance
    """

    wave: Any  # (NWAVE_EM,)
    temp: Any  # (NT,)
    k: Any  # (NWAVE_EM, NT, NEM)
    rate_coeff: Any  # (NT, NEM)
    dist_ref: Any  # (NEM,)

    emtype: Tuple[EmissionType, ...] = static_field(default=())
    gas_id: Tuple[int, ...] = static_field(default=())  # one gas per emission
    iso_id: Tuple[int, ...] = static_field(default=())
    ispace: WaveUnit = static_field(default=WaveUnit.Wavenumber_cm)

    @property
    def nem(self) -> int:
        return len(self.emtype)

    @property
    def nt(self) -> int:
        return self.temp.shape[0]
