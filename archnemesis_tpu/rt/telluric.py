"""Telluric (Earth-atmosphere) transmission for ground-based observations
(reference Telluric_0.py:36, calc_transmission:398).

The Earth's atmosphere above the observatory is split into 31 equal-height
layers (reference :410-417), a single upward slant path at zenith angle
180-EMISS_ANG is built with the spherical scale factors, gas line-of-sight
opacity is computed with the same opacity ops as the planetary forward
model, and the g-integrated transmission exp(-tau) is returned on the
telluric spectroscopy grid. The planetary driver multiplies this into the
calculation-grid spectrum before convolution (ForwardModel_0.py:538-552).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.core.types import Atmosphere, LayerConfig
from archnemesis_tpu.enums import (
    LayerIntegrationScheme,
    LayerType,
    RayleighScatteringMode,
    SpectralCalculationMode,
    WaveUnit,
)
from archnemesis_tpu.rt.layer import build_layers
from archnemesis_tpu.rt.path import _scale_factors
from archnemesis_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Telluric:
    """Telluric state: Earth atmosphere + its own spectroscopy tables
    (reference Telluric_0 holds an Atmosphere and a Spectroscopy)."""

    atm: Any  # Atmosphere (Earth)
    ktables: Any  # KTables / LBL tables / RuntimeLBL for the telluric gases
    altitude: Any  # observatory altitude [m]
    emiss_ang: Any  # 90 (horizon) .. 180 (zenith)

    nlay: int = static_field(default=31)


def telluric_transmission(tel: Telluric, wave=None):
    """(wave, transmission) of the Earth's atmosphere along the upward
    slant path (reference calc_transmission Telluric_0.py:398-536)."""
    from archnemesis_tpu.forward import layer_optical_depths, make_forward_config

    laycfg = LayerConfig(
        nlay=tel.nlay,
        laytyp=LayerType.EQUAL_HEIGHT,
        layint=LayerIntegrationScheme.ABSORBER_WEIGHTED_AVERAGE,
        layht=float(tel.altitude),
    )
    layers = build_layers(tel.atm, laycfg)

    # upward slant: zenith angle at the observer (AtmCalc_0.py:207)
    angle = 180.0 - tel.emiss_ang
    radius = tel.atm.radius
    h_top = layers.baseh[-1] + layers.delh[-1]
    z0 = radius + layers.baseh[0]
    sf = _scale_factors(layers, radius, h_top, angle, z0)  # (NLAY,)
    layers_los = layers.replace(amount=layers.amount * sf[:, None])

    cfg = make_forward_config(
        tel.atm,
        tel.ktables,
        None,
        iray=RayleighScatteringMode.NOT_INCLUDED,
        ispace=WaveUnit.Wavenumber_cm,
        gasgiant=True,
    )
    if wave is None:
        wave = jnp.asarray(tel.ktables.wave)
    od = layer_optical_depths(cfg, layers_los, wave, tel.ktables, None, None)
    taugas = od["taugas"]  # (NWAVE, NG, NLAY)
    tau_tot = jnp.sum(taugas, axis=2)  # (NWAVE, NG)
    trans = jnp.exp(-tau_tot)
    del_g = jnp.asarray(np.asarray(tel.ktables.del_g))
    return wave, trans @ del_g


def apply_telluric(
    tel: Optional[Telluric],
    wave_calc,
    spec,
    v_doppler=0.0,
    ispace: WaveUnit = WaveUnit.Wavenumber_cm,
):
    """Multiply the planetary calculation-grid spectrum by the telluric
    transmission (ForwardModel_0.py:538-552). ``wave_calc`` is corrected
    for the target's Doppler velocity [km/s, positive toward observer]
    before interpolation (reference correct_doppler_shift
    Measurement_0.py:2851): the telluric lines stay in the observatory
    rest frame while the planetary grid is shifted."""
    if tel is None:
        return spec
    wave_tel, trans = telluric_transmission(tel)
    c = 299792458.0
    if WaveUnit(ispace) == WaveUnit.Wavenumber_cm:
        wavecorr = wave_calc * (1.0 - v_doppler * 1.0e3 / c)
    else:
        wavecorr = wave_calc * (1.0 + v_doppler * 1.0e3 / c)
    return spec * jnp.interp(wavecorr, wave_tel, trans)


def extract_atmosphere_circ() -> Atmosphere:
    """Earth atmosphere from the bundled CIRC case-1 reference profile
    (reference Telluric_0.extract_atmosphere_circ:378, profile
    Data/reference_profiles/earth_circ_case1.ref)."""
    import os

    from archnemesis_tpu.data.datadir import data_path
    from archnemesis_tpu.io.legacy import read_ref

    return read_ref(data_path("reference_profiles", "earth_circ_case1.ref"))


def extract_atmosphere_era5(date: str = "01-01-2020",
                            time: str = "00:00:00",
                            latitude: float = 19.82067,
                            longitude: float = -155.46806) -> Atmosphere:
    """ERA5-reanalysis Earth atmosphere at a location/time (reference
    Telluric_0.extract_atmosphere_era5:178): P/T/H2O/O3 from the Climate
    Data Store, remaining species (CO2, N2O, CO, CH4, O2, N2) interpolated
    from the CIRC case-1 profile.

    Requires the optional ``cdsapi`` client and network access to the CDS;
    neither exists in an egress-free environment, so this raises with the
    offline alternative instead of hanging.
    """
    try:
        import cdsapi  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "ERA5 extraction needs the optional `cdsapi` package and "
            "network access to the Copernicus Climate Data Store "
            "(https://cds.climate.copernicus.eu/api-how-to). In an "
            "offline environment use extract_atmosphere_circ() — the "
            "bundled CIRC case-1 standard atmosphere — or load a "
            "pre-downloaded Earth profile with io.legacy.read_ref()."
        ) from e
    raise NotImplementedError(
        "cdsapi is importable but the ERA5 request flow is not wired in "
        "this build; use extract_atmosphere_circ() or a pre-downloaded "
        "profile."
    )
