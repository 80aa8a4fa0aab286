"""Collision-induced-absorption optical depth per layer.

TPU-first rewrite of the reference's per-layer loop (``ForwardModel_0.py:4516``
calc_tau_cia): temperature/para-H2 bracketing is a vectorized searchsorted
over all layers; the pair sum is an einsum over a static pair->gas mapping.

tau_cia[w, l] = XFAC[l] * sum_pairs k_pair(w, T_l, f_l) * q1[l] * q2[l]
with XFAC = (TOTAM cm-2)^2 / (DELH cm)  [molec^2 cm^-5].

The analytic CO2-CO2 / N2-N2 / N2-H2 band add-ons (CIA_0.py:631,710,775) are
applied when those gases are present.
"""

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.core.spectra import CIATables
from archnemesis_tpu.enums import WaveUnit
from archnemesis_tpu.utils.interp import interp1d_extrap_with_weights

AMAGAT = 2.68675e19  # molecule cm-3 (CIA_0.py:703)


@lru_cache(maxsize=1)
def _band_tables():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "assets", "cia_bands.npz",
    )
    with np.load(path) as d:
        return {k: d[k] for k in d.files}


def analytic_cia_curves(waven, prescale: float = 1.0):
    """Wavenumber-only k curves [cm5 molecule-2] for the analytic NIR CIA
    bands (reference CIA_0.py co2cia:631, n2n2cia:710, n2h2cia:775):
    measured coefficient tables (Tran+2025 CO2 2.3um window; McKellar N2-N2
    overtone and N2-H2) interpolated on their native knots, plus the CO2
    constant wavelength windows (De Bergh 1995, Fedorova+2014) overwritten
    in the reference's order. Returns (k_co2, k_n2n2, k_n2h2), each (NWAVE,).

    prescale multiplies the tables host-side in float64 BEFORE they become
    device constants — the raw ~1e-45 cm5 values are subnormal in float32,
    so the f32 path passes the 2**134 balance factor here instead of
    multiplying after the fact.
    """
    t = _band_tables()

    def tab(key):
        return jnp.interp(
            waven,
            jnp.asarray(t[key + "_knots"]),
            jnp.asarray(t[key + "_k"] * prescale),
            left=0.0,
            right=0.0,
        )

    k_co2 = tab("co2")
    wavel = 1.0e4 / waven
    for lo, hi, a in (
        (1.70, 1.76, 6.0e-9),
        (1.25, 1.35, 1.5e-9),
        (1.125, 1.225, 0.5 * (0.31 + 0.79) * 1e-9),
        (1.06, 1.125, 0.5 * (0.29 + 0.67) * 1e-9),
    ):
        k_co2 = jnp.where(
            (wavel >= lo) & (wavel <= hi), a / AMAGAT**2 * prescale, k_co2
        )
    return k_co2, tab("n2n2"), tab("n2h2")


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
    ico2: int = -1,
    in2: int = -1,
    ih2: int = -1,
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
    ico2, in2, ih2 : static atmosphere columns of CO2/N2/H2 (-1 = absent);
        enable the analytic NIR band add-ons (ForwardModel_0.py:4752-4770)
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
    # (2^134, sqrt = 2^67): bit-identical in f64, in-range in f32. The
    # table may already carry part of the factor (cia.k_scale, set by
    # CIATables.prescale() — REQUIRED for f32 decks, where the raw values
    # are subnormal); apply only the residual, in 2^67 half-steps so no
    # constant exceeds the f32 range.
    scale = 2.0**134
    half_scale = 2.0**67
    residual = scale / cia.k_scale
    totam_cm2 = totam * 1.0e-4
    xlen_cm = delh * 1.0e2
    xfac_scaled = (totam_cm2 / half_scale) ** 2 / xlen_cm
    # Alternate the residual's half-steps between the two non-constant
    # factors: a chain of constant multiplies on ONE operand is
    # reassociated by XLA's algebraic simplifier into a single folded
    # constant, and 2^67 * 2^67 = 2^134 overflows f32 to inf under jit
    # (0 * inf = NaN) even though the stepwise eager product is exact.
    # Power-of-two steps are exact in f64 either way (bit-identical).
    steps = []
    while residual > 1.0:
        step = min(residual, half_scale)
        steps.append(step)
        residual /= step
    xfac_pairs = xfac_scaled  # band add-ons below must NOT see the steps
    for i, step in enumerate(steps):
        if i % 2 == 0:
            sum_pairs = sum_pairs * step
        else:
            xfac_pairs = xfac_pairs * step
    tau = sum_pairs * xfac_pairs[None, :]

    # --- analytic NIR band add-ons (T-independent, ForwardModel_0.py:4752-4770);
    # curves enter pre-scaled by 2**134 so they survive float32
    if ico2 >= 0 or in2 >= 0:
        k_co2, k_n2n2, k_n2h2 = analytic_cia_curves(waven, prescale=scale)
        band = 0.0
        if ico2 >= 0:
            band = band + k_co2[:, None] * (q_lay[:, ico2] ** 2)[None, :]
        if in2 >= 0:
            band = band + k_n2n2[:, None] * (q_lay[:, in2] ** 2)[None, :]
        if in2 >= 0 and ih2 >= 0:
            band = band + k_n2h2[:, None] * (
                q_lay[:, in2] * q_lay[:, ih2]
            )[None, :]
        tau = tau + band * xfac_scaled[None, :]

    if ispace != WaveUnit.Wavenumber_cm:
        # undo the wavenumber sort back to the wavelength ordering
        tau = tau[::-1, :]
    return tau
