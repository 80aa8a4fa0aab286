"""Non-LTE emission rates and per-layer emitted radiance.

TPU-first rewrite of the reference emission pipeline
(``Emissions_0.calc_rates_hdf5`` ``Emissions_0.py:273`` +
``ForwardModel_0.calculate_layer_emission`` ``ForwardModel_0.py:4018``):
the per-layer/per-emission Python loops with repeated HDF5 reads become one
batched temperature-interpolation gather over the preloaded (wave, T, NEM)
table block, fused with the column-density contraction. Everything is pure
jnp — it vmaps over geometry and differentiates (the reference raises on
``return_grad=True`` here; jacfwd makes the gradient free).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.constants import C_LIGHT, C_LIGHT_CGS, H_PLANCK
from archnemesis_tpu.core.emissions import EmissionTables
from archnemesis_tpu.enums import EmissionType, WaveUnit
from archnemesis_tpu.utils.interp import interp1d_extrap

SQ_CM_TO_SQ_M = 1.0e-4
FOUR_PI = 4.0 * np.pi


def interp1d_zero(xp, fp, x):
    """Linear interpolation with zero fill outside [xp[0], xp[-1]] (matches
    scipy interp1d(bounds_error=False, fill_value=0.0) as used at
    ``ForwardModel_0.py:4177``). fp interpolated along axis 0."""
    y = interp1d_extrap(xp, fp, x)
    inside = (x >= xp[0]) & (x <= xp[-1])
    if fp.ndim > 1:
        inside = inside.reshape(inside.shape + (1,) * (fp.ndim - 1))
    return jnp.where(inside, y, jnp.zeros_like(y))


def emission_rates(em: EmissionTables, layer_temp, dist=None):
    """Emission rates per (wave, layer, emission) on the table wave grid.

    Reference ``calc_rates_hdf5`` (``Emissions_0.py:273``): clamped linear
    interpolation of K (and RATE_COEFF for chemical/photolysis emissions) in
    temperature, plus the (DIST_REF/dist)^2 stellar-distance rescaling of
    fluorescence/photolysis rates. ``dist`` is the planet-star distance in
    AU (traced; None when no stellar spectrum is attached).

    NT=1 tables are constant in temperature (the reference's NT==1 branch,
    ``Emissions_0.py:305-320``, applied per-emission here).

    Returns (NWAVE_EM, NLAY, NEM).
    """
    nem = em.nem
    tcl = jnp.clip(layer_temp, em.temp[0], em.temp[-1])  # (NLAY,)
    if em.nt == 1:
        k_t = jnp.broadcast_to(
            em.k[:, 0, :][:, None, :],
            (em.k.shape[0], layer_temp.shape[0], nem),
        )
        c_t = jnp.broadcast_to(
            em.rate_coeff[0][None, :], (layer_temp.shape[0], nem)
        )
    else:
        # interp along the T axis; clamping above makes it pure interpolation
        k_t = jnp.moveaxis(
            interp1d_extrap(em.temp, jnp.moveaxis(em.k, 1, 0), tcl), 0, 1
        )  # (NWAVE_EM, NLAY, NEM)
        c_t = interp1d_extrap(em.temp, em.rate_coeff, tcl)  # (NLAY, NEM)

    # fluorescence uses c=1 (Emissions_0.py:346-349)
    use_c = np.array(
        [1.0 if t != EmissionType.FLUORESCENCE else 0.0 for t in em.emtype]
    )
    c = jnp.where(jnp.asarray(use_c) > 0, c_t, jnp.ones_like(c_t))

    rates = k_t * c[None, :, :]

    if dist is not None:
        # stellar-distance rescaling for solar-pumped emissions
        # (Emissions_0.py:355-359)
        scale_mask = np.array(
            [
                1.0
                if t in (EmissionType.FLUORESCENCE, EmissionType.PHOTOLYSIS)
                else 0.0
                for t in em.emtype
            ]
        )
        scale = (em.dist_ref / dist) ** 2
        scale = jnp.where(jnp.asarray(scale_mask) > 0, scale,
                          jnp.ones_like(scale))
        rates = rates * scale[None, None, :]
    return rates


def layer_emission(
    em: EmissionTables,
    wave_calc,
    layer_temp,
    layer_amount,
    gas_cols,
    dist=None,
):
    """Per-layer emitted radiance on the calculation wave grid.

    Reference ``calculate_layer_emission`` (``ForwardModel_0.py:4018``):
    EMI(w, l) = sum_e rate(w, l, e) * N_e(l) / 4pi, converted from photon to
    energy units with the per-wave photon energy, then interpolated from the
    table grid onto the calc grid with zero fill (:4177). The layer->path
    gather happens downstream (path_spectrum), which commutes with the wave
    interpolation.

    Parameters
    ----------
    layer_amount : (NLAY, NVMR) layer column densities [m^-2]
    gas_cols : static tuple, atmosphere gas column per emission

    Returns (NWAVE_CALC, NLAY) in W cm-2 sr-1 (cm-1)-1 (or um-1).
    """
    rates = emission_rates(em, layer_temp, dist=dist)  # (NWAVE_EM, NLAY, NEM)
    colden = (
        layer_amount[:, jnp.asarray(gas_cols)] * SQ_CM_TO_SQ_M / FOUR_PI
    )  # (NLAY, NEM) [cm^-2]
    emi = jnp.einsum("wle,le->wl", rates, colden)

    # photon -> energy units (ForwardModel_0.py:4078-4085)
    if em.ispace == WaveUnit.Wavenumber_cm:
        factor = H_PLANCK * C_LIGHT_CGS * em.wave
    else:
        factor = H_PLANCK * C_LIGHT / (em.wave * 1.0e-6)
    emi = emi * factor[:, None]

    return interp1d_zero(em.wave, emi, wave_calc)


def locate_emission_gases(em: EmissionTables, atm_gas_id, atm_iso_id):
    """Static resolution of each emission's gas to an atmosphere VMR column
    (exact (ID, ISO) match, ForwardModel_0.py:4064)."""
    cols = []
    for g, s in zip(em.gas_id, em.iso_id):
        matches = [
            i
            for i, (ag, as_) in enumerate(zip(atm_gas_id, atm_iso_id))
            if ag == g and as_ == s
        ]
        if len(matches) != 1:
            raise ValueError(
                f"emission gas {g} iso {s}: expected exactly one atmosphere "
                f"match, found {len(matches)}"
            )
        cols.append(matches[0])
    return tuple(cols)
