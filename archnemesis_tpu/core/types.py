"""Core component pytrees.

The reference holds its run state in 11 mutable classes that are deepcopied
per forward evaluation (``ForwardModel_0.py:493-499``). Here every component
is a frozen pytree: traced array fields flow through jit/vmap/jacfwd, static
fields (counts, enums, gas ids) are compile-time metadata.

Shapes are static; ragged per-geometry data is padded to max + masked.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

from archnemesis_tpu.enums import (
    AtmosphericProfileFormat,
    LayerIntegrationScheme,
    LayerType,
)
from archnemesis_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Atmosphere:
    """Vertical profiles of one atmosphere column.

    Mirrors the capability of the reference ``Atmosphere_0`` class
    (``Atmosphere_0.py:44``): heights/pressures/temperatures/VMRs/aerosols on
    NP profile levels, plus planetary context needed for gravity and
    hydrostatic balance.
    """

    h: Any  # (NP,) heights [m]
    p: Any  # (NP,) pressures [Pa]
    t: Any  # (NP,) temperatures [K]
    vmr: Any  # (NP, NVMR) volume mixing ratios
    dust: Any  # (NP, NDUST) aerosol density [particles m-3] (or per gram)
    parah2: Any  # (NP,) para-H2 fraction (zeros if unused)
    molwt: Any  # (NP,) molecular weight profile [kg mol-1]
    radius: Any  # scalar: planetocentric radius at H=0 [m]
    latitude: Any  # scalar [deg]
    # optional retrieved planet-radius override [m] (models 555/556); when
    # None, gravity uses the catalogue radius
    planet_radius: Any = None
    # per-mode dust-column renormalisation target: optical depth the layered
    # dust column is rescaled to (reference DUST_RENORMALISATION,
    # Atmosphere_0.py:188 / ForwardModel_0.py:4833). None = off; otherwise
    # (NDUST,) with 0 entries meaning "no renorm for this mode".
    dust_renorm: Any = None

    # static metadata
    gas_id: Tuple[int, ...] = static_field(default=())
    iso_id: Tuple[int, ...] = static_field(default=())
    planet: int = static_field(default=0)
    amform: AtmosphericProfileFormat = static_field(
        default=AtmosphericProfileFormat.CALC_MOLECULAR_WEIGHT_SCALE_VMR_TO_ONE
    )
    dust_units_flag: Optional[Tuple[int, ...]] = static_field(default=None)
    # saturation-vapour-pressure caps from the .vpf file: tuples of
    # (gas_id, iso_id, vp, svpflag) (reference Atmosphere_0.SVP :191)
    svp: Optional[Tuple[Tuple[int, int, float, int], ...]] = static_field(
        default=None
    )

    @property
    def np_(self) -> int:
        return self.h.shape[0]

    @property
    def nvmr(self) -> int:
        return self.vmr.shape[1]

    @property
    def ndust(self) -> int:
        return self.dust.shape[1]


def stack_atmospheres(atms):
    """Stack single-location Atmospheres into one multi-location pytree with
    a leading (NLOCATIONS,) axis on every profile leaf.

    TPU-native counterpart of the reference's NLOCATIONS mode
    (Atmosphere_0.py:164-182, 2D (NP, NLOCATIONS) arrays): the batched
    pytree feeds `jax.vmap`-ed forward models, and per-location
    parameterisations (model 1002) scale along the leading axis. Static
    metadata must match across locations.
    """
    import jax

    a0 = atms[0]
    for a in atms[1:]:
        if (a.gas_id, a.iso_id, a.planet, a.amform) != (
            a0.gas_id, a0.iso_id, a0.planet, a0.amform
        ):
            raise ValueError("atmospheres must share static metadata")
    return jax.tree_util.tree_map(
        lambda *xs: (
            np.stack([np.asarray(x) for x in xs])
            if xs[0] is not None
            else None
        ),
        *atms,
    )


@pytree_dataclass
class LayerConfig:
    """Static layering scheme (reference ``Layer_0`` settings)."""

    nlay: int = static_field(default=20)
    laytyp: LayerType = static_field(default=LayerType.EQUAL_LOG_PRESSURE)
    layint: LayerIntegrationScheme = static_field(
        default=LayerIntegrationScheme.ABSORBER_WEIGHTED_AVERAGE
    )
    nint: int = static_field(default=101)
    layht: float = static_field(default=0.0)
    # user-specified base grids for LayerType.BASE_PRESSURE / BASE_HEIGHT
    h_base: Optional[np.ndarray] = static_field(default=None)
    p_base: Optional[np.ndarray] = static_field(default=None)


@pytree_dataclass
class Layers:
    """Averaged per-layer properties along the splitting path.

    The arrays mirror the reference's ``Layer_0`` attributes
    (``Layer_0.py:153-182``) — base/effective P, T, H plus slant column
    densities; LAYSF scales slant columns back to vertical.
    """

    baseh: Any  # (NLAY,) base altitude [m]
    basep: Any  # (NLAY,) base pressure [Pa]
    baset: Any  # (NLAY,) base temperature [K]
    delh: Any  # (NLAY,) layer vertical thickness [m]
    height: Any  # (NLAY,) effective altitude [m]
    press: Any  # (NLAY,) effective pressure [Pa]
    temp: Any  # (NLAY,) effective temperature [K]
    totam: Any  # (NLAY,) vertical gas column density [m-2]
    amount: Any  # (NLAY, NVMR) vertical per-gas column density [m-2]
    pp: Any  # (NLAY, NVMR) effective partial pressures [Pa]
    cont: Any  # (NLAY, NDUST) vertical dust column density [m-2]
    frac: Any  # (NLAY,) para-H2 fraction
    laysf: Any  # (NLAY,) layer scaling factor (slant path / vertical)

    @property
    def nlay(self) -> int:
        return self.baseh.shape[0]
