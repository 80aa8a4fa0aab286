"""Correlated-k / LBL table interpolation to layer (P, T) points.

TPU-first rewrite of the reference's per-point loop (``Spectroscopy_0.py:2147``
calc_kg): the nearest-bracket search becomes a vectorized searchsorted +
gather over all layers at once; the log-bilinear blend is one fused
elementwise expression over the (wave, g, layer, gas) block.

Reference semantics preserved exactly:
- interpolation is bilinear in (ln P, T) of ln k where all 4 surrounding
  table values are > 0;
- bilinear of raw k where all 4 are <= 0 (all-zero regions);
- zero where the 4 corners are mixed sign;
- out-of-range P/T clamp to the table edges (v,u in [0,1]).
"""

import jax.numpy as jnp
import numpy as np


def _bracket(grid, x):
    """Indices (lo, hi) and clamped fraction for linear interpolation with
    edge clamping, matching the reference's argmin-based bracketing."""
    grid = jnp.asarray(grid)
    hi = jnp.clip(jnp.searchsorted(grid, x, side="left"), 1, grid.shape[0] - 1)
    lo = hi - 1
    f = (x - grid[lo]) / (grid[hi] - grid[lo])
    return lo, hi, jnp.clip(f, 0.0, 1.0)


LOG_POS_THRESH = -8.0e8  # sentinel cut: host logk stores -1e9 where k <= 0


def host_log_ktable(k64):
    """Host-side f64 log of a k-table for the float32 device path.

    The TPU f32 ``log`` intrinsic is good to only ~28 ulp (measured,
    BASELINE.md): at |log k| ~ 50 that is ~1e-4 ABSOLUTE in log space,
    which ``exp`` turns into ~1e-4 relative k error — the dominant term
    of the r4 TPU-f32 deck residual (3e-4). The table is static, so its
    logs can be taken once on the host in f64 and stored (correct to the
    0.5-ulp f32 rounding of the stored value, ~4e-6 absolute): the TPU
    log disappears from the hot path entirely.

    k <= 0 entries get a -1e9 sentinel (the positivity mask survives the
    encoding); 0 < k < f32-tiny clamps to log(tiny), as the device-side
    ``log(max(k, tiny))`` did.
    """
    k64 = np.asarray(k64, np.float64)
    tiny = float(np.finfo(np.float32).tiny)
    out = np.where(
        k64 > 0.0, np.log(np.maximum(k64, tiny)), -1.0e9
    )
    return out.astype(np.float32)


def interp_ktables(k, press_grid, temp_grid, press, temp, logk=None):
    """Interpolate k-tables to layer pressure/temperature points.

    Parameters
    ----------
    k : (NGAS, NWAVE, NG, NP, NT) table k-coefficients [cm^2]
    press_grid : (NP,) table pressures [atm]
    temp_grid : (NT,) table temperatures [K]
    press : (NLAY,) layer pressures [atm]
    temp : (NLAY,) layer temperatures [K]
    logk : optional (NGAS, NWAVE, NG, NP, NT) HOST-precomputed
        ``host_log_ktable`` values. When given, the corner gathers read
        the log table instead of k and no device ``log`` is evaluated —
        the f32/TPU accuracy path. One semantic difference from the
        k-path: regions where all 4 corners are <= 0 return exactly 0
        instead of the (non-physical, <= 0) raw bilinear value.

    Returns
    -------
    kgood : (NWAVE, NG, NLAY, NGAS)
    """
    k = jnp.asarray(k)
    lgrid = jnp.log(jnp.asarray(press_grid))
    ipl, iphi, v = _bracket(lgrid, jnp.log(press))  # (NLAY,)
    itl, ithi, u = _bracket(temp_grid, temp)  # (NLAY,)

    if logk is not None:
        lk = jnp.asarray(logk)
        l11 = lk[:, :, :, ipl, itl]
        l12 = lk[:, :, :, ipl, ithi]
        l21 = lk[:, :, :, iphi, itl]
        l22 = lk[:, :, :, iphi, ithi]
        w11 = (1.0 - v) * (1.0 - u)
        w21 = v * (1.0 - u)
        w22 = v * u
        w12 = (1.0 - v) * u
        loglin = w11 * l11 + w21 * l21 + w22 * l22 + w12 * l12
        all_pos = (
            (l11 > LOG_POS_THRESH) & (l12 > LOG_POS_THRESH)
            & (l21 > LOG_POS_THRESH) & (l22 > LOG_POS_THRESH)
        )
        out = jnp.where(all_pos, jnp.exp(loglin), 0.0)
        return jnp.moveaxis(out, 0, -1)

    # corner gathers -> (NGAS, NWAVE, NG, NLAY)
    klo1 = k[:, :, :, ipl, itl]
    klo2 = k[:, :, :, ipl, ithi]
    khi1 = k[:, :, :, iphi, itl]
    khi2 = k[:, :, :, iphi, ithi]

    w11 = (1.0 - v) * (1.0 - u)
    w21 = v * (1.0 - u)
    w22 = v * u
    w12 = (1.0 - v) * u

    tiny = jnp.finfo(k.dtype).tiny
    loglin = (
        w11 * jnp.log(jnp.maximum(klo1, tiny))
        + w21 * jnp.log(jnp.maximum(khi1, tiny))
        + w22 * jnp.log(jnp.maximum(khi2, tiny))
        + w12 * jnp.log(jnp.maximum(klo2, tiny))
    )
    lin = w11 * klo1 + w21 * khi1 + w22 * khi2 + w12 * klo2

    all_pos = (klo1 > 0.0) & (klo2 > 0.0) & (khi1 > 0.0) & (khi2 > 0.0)
    all_nonpos = (klo1 <= 0.0) & (klo2 <= 0.0) & (khi1 <= 0.0) & (khi2 <= 0.0)

    out = jnp.where(all_pos, jnp.exp(loglin), jnp.where(all_nonpos, lin, 0.0))
    # (NGAS, NWAVE, NG, NLAY) -> (NWAVE, NG, NLAY, NGAS)
    return jnp.moveaxis(out, 0, -1)
