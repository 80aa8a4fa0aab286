"""Thermal-emission radiative transfer along line-of-sight paths.

TPU-first rewrite of the reference kernel (``ForwardModel_0.py:6288``
calc_thermal_emission_spectrum): the per-(wave, g) Python loop with a running
transmission becomes a cumulative sum over the path axis — one fused
cumsum+exp+weighted-reduction over the whole (wave, g, layer, path) block.

spec = sum_j (T_{j-1} - T_j) * B(T_emission_j) + T_N * radground
with T_j = exp(-cumsum(tau)_j) along the path (observer -> far end).
"""

import jax.numpy as jnp

from archnemesis_tpu.ops.planck import planck


def thermal_emission_spectrum(
    wave,
    tau_path,
    emtemp,
    mask,
    tsurf,
    emissivity,
    surface_visible: bool,
    gasgiant: bool,
    solflux=None,
    reflectance=None,
    sol_ang=None,
    emiss_ang=None,
    emission_path=None,
    ispace=0,
):
    """Thermal-emission spectra for all paths at once.

    Parameters
    ----------
    wave : (NWAVE,)
    tau_path : (NWAVE, NG, NLAYIN, NPATH) LOS optical depth per included layer
    emtemp : (NLAYIN, NPATH) emission temperatures along each path
    mask : (NLAYIN, NPATH) 1 where the layer participates
    tsurf : scalar surface temperature (<=0 -> bottom-layer Planck)
    emissivity : (NWAVE,) surface emissivity on the calc grid
    surface_visible : static; False for limb paths (no ground term)
    gasgiant : static; True -> radground = Planck(bottom layer T)
    emission_path : optional (NWAVE, NLAYIN, NPATH) non-LTE layer emission

    Returns
    -------
    spec : (NWAVE, NG, NPATH)
    """
    taud = jnp.cumsum(tau_path * mask[None, None, :, :], axis=2)
    tr = jnp.exp(-taud)
    trold = jnp.concatenate(
        [jnp.ones_like(tr[:, :, :1, :]), tr[:, :, :-1, :]], axis=2
    )
    bb = planck(wave[:, None, None], emtemp[None, :, :], ispace)  # (NWAVE,NLAYIN,NPATH)
    spec = jnp.einsum(
        "wgjp,wjp->wgp", (trold - tr), bb * mask[None, :, :]
    )
    if emission_path is not None:
        spec = spec + jnp.einsum(
            "wgjp,wjp->wgp", tr, emission_path * mask[None, :, :]
        )

    if surface_visible:
        tr_tot = tr[:, :, -1, :]  # transmission after full path
        if gasgiant:
            radground = planck(wave[:, None], emtemp[-1, :][None, :], ispace)
        else:
            radground = (
                planck(wave, tsurf, ispace)[:, None] * emissivity[:, None]
            )
        spec = spec + tr_tot * radground[:, None, :]

        if solflux is not None and reflectance is not None:
            # plane-parallel surface reflection (ForwardModel_0.py:6368-6374);
            # active only when both angles < 90
            mu = jnp.cos(jnp.deg2rad(emiss_ang))
            mu0 = jnp.cos(jnp.deg2rad(sol_ang))
            active = ((emiss_ang < 90.0) & (sol_ang < 90.0)).astype(spec.dtype)
            taud_tot = taud[:, :, -1, :]
            refl_term = (
                tr_tot
                * jnp.exp(-taud_tot * mu[None, None, :] / mu0[None, None, :])
                * (solflux * reflectance)[:, None, None]
            )
            spec = spec + refl_term * active[None, None, :]
    return spec


def transmission_spectrum(tau_total_path):
    """Pure transmission: exp(-tau) (reference calculate_transmission_spectrum)."""
    return jnp.exp(-tau_total_path)


def absorption_spectrum(tau_total_path):
    """1 - exp(-tau) (reference calculate_absorption_spectrum)."""
    return 1.0 - jnp.exp(-tau_total_path)
