"""Single-scattering plane-parallel RT.

Vectorised re-expression of the reference numba kernel
``calc_singlescatt_plane_spectrum`` (ForwardModel_0.py:6509-6607) and its
driver ``calculate_single_scattering_plane_parallel_spectrum`` (:4251):
the per-(wave, g) Python loops become a cumulative-transmission expression
over the path-layer axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.ops.planck import planck


def scattering_cos_angle(sol_ang, emiss_ang, azi_ang):
    """cos(alpha) of the single-scattering angle (reference :4265-4266)."""
    sol = jnp.deg2rad(sol_ang)
    emi = jnp.deg2rad(emiss_ang)
    azi = jnp.deg2rad(azi_ang)
    return jnp.sin(sol) * jnp.sin(emi) * jnp.cos(azi - np.pi) - jnp.cos(
        emi
    ) * jnp.cos(sol)


def layer_mean_phase(phase_modes, phase_ray, tauclscat, tauray, tauscat):
    """Scattering-weighted mean phase function per layer (reference
    :4317-4322).

    phase_modes: (NWAVE, NDUST) phase of each aerosol at the path's
    scattering angle; phase_ray: scalar or (NWAVE,); tauclscat:
    (NWAVE, NLAY, NDUST); tauray/tauscat: (NWAVE, NLAY).
    Returns (NWAVE, NLAY).
    """
    num = jnp.einsum("wd,wld->wl", phase_modes, tauclscat)
    num = num + phase_ray[:, None] * tauray
    den = tauray + tauscat
    return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)


def single_scatter_plane_spectrum(
    wave,
    tau_layinc,     # (NWAVE, NG, NLAYIN) LOS optical depth per path layer
    emtemp,         # (NLAYIN,) layer temperatures along the path
    emomega,        # (NWAVE, NG, NLAYIN) single-scattering albedo
    emphase,        # (NWAVE, NLAYIN) mean phase function along the path
    mask,           # (NLAYIN,) 1.0 where the layer participates
    tsurf,
    emissivity,     # (NWAVE,)
    brdf,           # (NWAVE,) surface BRDF at the path geometry
    solar,          # (NWAVE,)
    sol_ang,
    emiss_ang,
    ispace: int = 0,
):
    """One path's single-scatter spectrum (NWAVE, NG) (reference
    calc_singlescatt_plane_spectrum ForwardModel_0.py:6509)."""
    mu = jnp.cos(jnp.deg2rad(emiss_ang))
    mu0 = jnp.cos(jnp.deg2rad(sol_ang))
    ssfac = mu0 / (mu0 + mu)

    taud = jnp.cumsum(tau_layinc * mask[None, None, :], axis=2)
    tr = jnp.exp(-taud)  # (NWAVE, NG, NLAYIN)
    trold = jnp.concatenate(
        [jnp.ones_like(tr[:, :, :1]), tr[:, :, :-1]], axis=2
    )
    dtr = (trold - tr) * mask[None, None, :]

    bb = planck(wave[:, None], emtemp[None, :], ispace=ispace)  # (NWAVE, NLAYIN)
    scat = ssfac * emomega * emphase[:, None, :] * solar[:, None, None] / (
        4.0 * np.pi
    )
    specg = jnp.sum(dtr * (scat + bb[:, None, :]), axis=2)

    # transmission to the bottom of the path (last active layer)
    n_active = jnp.sum(mask).astype(jnp.int32)
    tr_bottom = jnp.take(tr, n_active - 1, axis=2)  # (NWAVE, NG)

    t_bottom = emtemp[n_active - 1]
    radground = jnp.where(
        tsurf <= 0.0,
        planck(wave, t_bottom, ispace=ispace),
        planck(wave, tsurf, ispace=ispace) * emissivity,
    )  # (NWAVE,)
    specg = specg + tr_bottom * radground[:, None]
    specg = specg + tr_bottom * (solar * mu0 * brdf)[:, None]
    return specg
