"""Aerosol (dust) extinction/scattering optical depth per layer.

Mirrors reference ``calc_tau_dust`` (ForwardModel_0.py:4790): interpolate the
per-population extinction/scattering cross sections to the calculation grid
(linear for <=2-point tables, cubic spline otherwise) and multiply by the
layer dust column densities.
"""

import jax.numpy as jnp

from archnemesis_tpu.utils.interp import interp1d_extrap


def _cubic_spline_eval(xs, ys, xq):
    """Natural-boundary... no: not-a-knot cubic spline matching
    scipy.interpolate.CubicSpline defaults, solved densely (NWAVE_XSC is
    tiny). ys may have trailing dims."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    n = xs.shape[0]
    h = xs[1:] - xs[:-1]
    # build not-a-knot tridiagonal-ish system for second derivatives is
    # fiddly; use the equivalent formulation via jnp.linalg.solve on the
    # full (n x n) system for the spline coefficients c (second derivs / 2).
    # Rows 1..n-2: continuity of second derivative; rows 0, n-1: not-a-knot.
    a = jnp.zeros((n, n), dtype=xs.dtype)
    rhs_shape = (n,) + ys.shape[1:]
    rhs = jnp.zeros(rhs_shape, dtype=ys.dtype)
    for i in range(1, n - 1):
        a = a.at[i, i - 1].set(h[i - 1])
        a = a.at[i, i].set(2.0 * (h[i - 1] + h[i]))
        a = a.at[i, i + 1].set(h[i])
        rhs = rhs.at[i].set(
            3.0 * ((ys[i + 1] - ys[i]) / h[i] - (ys[i] - ys[i - 1]) / h[i - 1])
        )
    # not-a-knot end conditions
    a = a.at[0, 0].set(h[1])
    a = a.at[0, 1].set(-(h[0] + h[1]))
    a = a.at[0, 2].set(h[0])
    a = a.at[n - 1, n - 3].set(h[-1])
    a = a.at[n - 1, n - 2].set(-(h[-2] + h[-1]))
    a = a.at[n - 1, n - 1].set(h[-2])
    c = jnp.linalg.solve(a, rhs.reshape(n, -1)).reshape(rhs_shape)

    b = (ys[1:] - ys[:-1]) / h.reshape((-1,) + (1,) * (ys.ndim - 1)) - (
        h.reshape((-1,) + (1,) * (ys.ndim - 1)) * (2.0 * c[:-1] + c[1:])
    ) / 3.0
    d = (c[1:] - c[:-1]) / (
        3.0 * h.reshape((-1,) + (1,) * (ys.ndim - 1))
    )

    j = jnp.clip(jnp.searchsorted(xs, xq, side="right") - 1, 0, n - 2)
    dx = (xq - xs[j]).reshape((-1,) + (1,) * (ys.ndim - 1))
    return ys[j] + b[j] * dx + c[j] * dx**2 + d[j] * dx**3


def dust_tau(xsc_wave, kext, ksca, wavec, cont):
    """Aerosol optical depths.

    Parameters
    ----------
    xsc_wave : (NWX,) cross-section wave grid
    kext, ksca : (NWX, NDUST) cross sections [cm^2 particle^-1]
    wavec : (NWAVE,) calculation grid
    cont : (NLAY, NDUST) dust column densities [particles m^-2]

    Returns
    -------
    taudust : (NWAVE, NLAY) extinction optical depth (summed over dust)
    tauscat : (NWAVE, NLAY) scattering optical depth
    tauclscat : (NWAVE, NLAY, NDUST) per-population scattering
    """
    if xsc_wave.shape[0] > 2:
        kext_c = _cubic_spline_eval(xsc_wave, kext, wavec)
        ksca_c = _cubic_spline_eval(xsc_wave, ksca, wavec)
    else:
        kext_c = interp1d_extrap(xsc_wave, kext, wavec)
        ksca_c = interp1d_extrap(xsc_wave, ksca, wavec)

    sq_cm_to_sq_m = 1.0e-4
    taudust_i = kext_c[:, None, :] * sq_cm_to_sq_m * cont[None, :, :]
    tauclscat = ksca_c[:, None, :] * sq_cm_to_sq_m * cont[None, :, :]
    taudust_i = jnp.clip(jnp.nan_to_num(taudust_i), 0.0, 1e20)
    return (
        jnp.sum(taudust_i, axis=2),
        jnp.sum(tauclscat, axis=2),
        tauclscat,
    )
