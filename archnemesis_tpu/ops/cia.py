"""Collision-induced-absorption optical depth per layer.

TPU-first rewrite of the reference's per-layer loop (``ForwardModel_0.py:4516``
calc_tau_cia): temperature/para-H2 bracketing is a vectorized searchsorted
over all layers; the pair sum is an einsum over a static pair->gas mapping.

tau_cia[w, l] = XFAC[l] * sum_pairs k_pair(w, T_l, f_l) * q1[l] * q2[l]
with XFAC = (TOTAM cm-2)^2 / (DELH cm)  [molec^2 cm^-5].

The analytic CO2-CO2 / N2-N2 / N2-H2 band add-ons (CIA_0.py:631,710,775) are
applied when those gases are present.
"""

import jax.numpy as jnp

from archnemesis_tpu.core.spectra import CIATables
from archnemesis_tpu.enums import WaveUnit
from archnemesis_tpu.utils.interp import interp1d_extrap_with_weights


def _bracket_clamped(grid, x):
    grid = jnp.asarray(grid)
    hi = jnp.clip(jnp.searchsorted(grid, x, side="left"), 1, grid.shape[0] - 1)
    lo = hi - 1
    f = jnp.clip((x - grid[lo]) / (grid[hi] - grid[lo]), 0.0, 1.0)
    return lo, hi, f


def cia_tau(
    cia: CIATables,
    wavec,
    temp_lay,
    frac_lay,
    q_lay,
    totam,
    delh,
    pair_q1_idx,
    pair_q2_idx,
    pair_active,
    ispace=WaveUnit.Wavenumber_cm,
):
    """CIA optical depth (NWAVE, NLAY).

    Parameters
    ----------
    wavec : (NWAVE,) calculation grid (cm-1 or um per ispace)
    temp_lay, frac_lay : (NLAY,) layer temperature / para-H2 fraction
    q_lay : (NLAY, NVMR) layer volume mixing ratios (PP/PRESS)
    totam : (NLAY,) layer column density [m-2]
    delh : (NLAY,) layer thickness [m]
    pair_q1_idx, pair_q2_idx : static (NPAIR,) indices into q_lay columns for
        each CIA pair's two gases (use 0 for inactive pairs)
    pair_active : static (NPAIR,) 0/1 mask — pair present in atmosphere AND
        (not INORMAL-dependent OR its INORMALT matches the run's INORMAL)
    """
    if ispace == WaveUnit.Wavenumber_cm:
        waven = wavec
    else:
        waven = jnp.sort(1.0e4 / wavec)

    # --- temperature / para-H2 interpolation of the table, per layer
    itl, ithi, ut = _bracket_clamped(cia.temp, temp_lay)  # (NLAY,)
    k = jnp.asarray(cia.k_cia)  # (NPAIR, NPARA1, NT, NWAVE_CIA)
    if cia.npara == 0:
        # NPARA=0: the para-fraction blend (0.5/0.5) acts on identical
        # slices, so it reduces to plain T interpolation
        ktlo = k[:, 0, itl, :]  # (NPAIR, NLAY, NWAVE_CIA)
        kthi = k[:, 0, ithi, :]
        kt = ktlo * (1 - ut[None, :, None]) + kthi * ut[None, :, None]
    else:
        ipl, iphi, uf = _bracket_clamped(cia.frac, frac_lay)
        k_t_lo = k[:, :, itl, :]  # (NPAIR, NPARA, NLAY, NWAVE_CIA) via fancy
        k_t_hi = k[:, :, ithi, :]
        kT = k_t_lo * (1 - ut[None, None, :, None]) + k_t_hi * ut[None, None, :, None]
        # gather para bracket: kT is (NPAIR, NPARA, NLAY, NW)
        lay = jnp.arange(temp_lay.shape[0])
        klo = kT[:, ipl, lay, :]
        khi = kT[:, iphi, lay, :]
        kt = klo * (1 - uf[None, :, None]) + khi * uf[None, :, None]

    # --- interpolate to calculation wavenumbers (zero outside table range)
    j, f = interp1d_extrap_with_weights(cia.waven, waven)
    in_range = (waven >= cia.waven[0]) & (waven <= cia.waven[-1])
    k_w = kt[..., j - 1] * (1 - f) + kt[..., j] * f  # (NPAIR, NLAY, NWAVE)
    k_w = jnp.where(in_range[None, None, :], k_w, 0.0)

    # --- pair mixing-ratio products
    q1 = q_lay[:, pair_q1_idx]  # (NLAY, NPAIR)
    q2 = q_lay[:, pair_q2_idx]
    qq = (q1 * q2) * jnp.asarray(pair_active)[None, :]  # (NLAY, NPAIR)

    sum_pairs = jnp.einsum("plw,lp->wl", k_w, qq)

    # XFAC = (TOTAM cm-2)^2 / (DELH cm): TOTAM^2 ~ 1e50 overflows f32 and
    # k_cia ~ 1e-45 underflows it. Balance with an exact power-of-2 scale
    # (2^134, sqrt = 2^67): bit-identical in f64, in-range in f32.
    scale = 2.0**134
    half_scale = 2.0**67
    totam_cm2 = totam * 1.0e-4
    xlen_cm = delh * 1.0e2
    xfac_scaled = (totam_cm2 / half_scale) ** 2 / xlen_cm
    tau = (sum_pairs * scale) * xfac_scaled[None, :]

    if ispace != WaveUnit.Wavenumber_cm:
        # undo the wavenumber sort back to the wavelength ordering
        tau = tau[::-1, :]
    return tau
