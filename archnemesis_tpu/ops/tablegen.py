"""Look-up-table generation: .lta (monochromatic) and .kta (correlated-k)
tables from line lists.

Counterpart of the reference offline pipeline (Spectroscopy_0.py:
calc_lbltable:3124, calc_ktable:3338, calc_ktable_chunk:3558): the LBL
synthesis runs through the framework's blocked Voigt kernel — one jitted
evaluation per (P, T) batch — while the host orchestrates the adaptive
fine grid and the g-ordinate CDF binning (an offline pipeline, not a
forward-model hot path).
"""

from __future__ import annotations

import numpy as np

from archnemesis_tpu.io.linedata import LineList, _slice_lines
from archnemesis_tpu.ops.lbl import build_blocks, lbl_cross_section


def gauss_legendre_g(ng: int):
    """g-ordinates + weights (reference calc_ktable :3444-3447)."""
    x, w = np.polynomial.legendre.leggauss(ng)
    return 0.5 * (x + 1.0), 0.5 * w


def generate_lbltable(
    ll: LineList,
    press_atm: np.ndarray,
    temp: np.ndarray,
    wave: np.ndarray,
    amb_frac: float = 1.0,
    lineshape: str = "voigt",
    wn_calc_window: float = 25.0,
    wn_approx_window: float = 75.0,
    include_pressure_shift: bool = True,
    restrict_lines: bool = True,
) -> np.ndarray:
    """Monochromatic cross-sections k(NWAVE, NP, NT) on the table grid
    (reference calc_lbltable Spectroscopy_0.py:3124; its chunk driver
    restricts lines to the table wave range, :3249)."""
    if restrict_lines:
        ll = _slice_lines(ll, wave.min(), wave.max())
    blocks = build_blocks(wave, ll.nu, wn_approx_window=wn_approx_window)
    npress, ntemp = len(press_atm), len(temp)
    pp, tt = np.meshgrid(press_atm, temp, indexing="ij")
    k = lbl_cross_section(
        ll, blocks,
        tt.ravel(), pp.ravel(), np.full(npress * ntemp, amb_frac),
        lineshape=lineshape, wn_calc_window=wn_calc_window,
        wn_approx_window=wn_approx_window,
        include_pressure_shift=include_pressure_shift,
    )  # (NWAVE, NP*NT)
    return np.asarray(k).reshape(len(wave), npress, ntemp)


def generate_ktable(
    ll: LineList,
    press_atm: np.ndarray,
    temp: np.ndarray,
    wave: np.ndarray,          # bin centres (uniform)
    ng: int,
    amb_frac: float = 1.0,
    lineshape: str = "voigt",
    wn_calc_window: float = 25.0,
    wn_approx_window: float = 75.0,
    include_pressure_shift: bool = True,
    fine_points_cap: int = 2_000_000,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Correlated-k coefficients k_g(NWAVE, NG, NP, NT) for square bins of
    width delv centred on ``wave`` (reference calc_ktable_chunk
    Spectroscopy_0.py:3558: adaptive fine grid at min(HWHM)/5 per (P,T),
    cross-sections sorted per bin into a cumulative distribution and
    interpolated at the Gauss-Legendre g-ordinates).

    Returns (k_g, g_ord, del_g).
    """
    from archnemesis_tpu.constants import C_LIGHT_CGS, K_B_CGS, N_AVOGADRO

    g_ord, del_g = gauss_legendre_g(ng)
    delwave = wave[1] - wave[0]
    vmin = wave[0] - delwave / 2.0
    vmax = wave[-1] + delwave / 2.0

    # lines fetched with a doubled approx-window pad (reference :3590-3596)
    ll_win = _slice_lines(
        ll, vmin - 2.0 * wn_approx_window, vmax + 2.0 * wn_approx_window
    )

    npress, ntemp = len(press_atm), len(temp)
    k_g = np.zeros((len(wave), ng, npress, ntemp))
    doppler_const = (1.0 / C_LIGHT_CGS) * np.sqrt(
        2.0 * np.log(2.0) * N_AVOGADRO * K_B_CGS
    )

    for ip, p in enumerate(press_atm):
        for it, t in enumerate(temp):
            # adaptive resolution: min Voigt HWHM / 5 (reference :3617-3624)
            alpha_d = doppler_const * ll_win.nu * np.sqrt(t / ll_win.mass)
            t_ratio = ll_win.t_ref / t
            gam = (
                t_ratio ** ll_win.broad[1] * ll_win.broad[0] * (1.0 - amb_frac)
                + t_ratio ** ll_win.broad[4] * ll_win.broad[3] * amb_frac
            ) * (p / ll_win.p_ref)
            hwhm = 0.5346 * gam + np.sqrt(0.2166 * gam**2 + alpha_d**2)
            delv_calc = np.min(hwhm) / 5.0
            ncalc = int((vmax - vmin) / delv_calc)
            ncalc = min(ncalc, fine_points_cap)
            wavecalc = np.linspace(vmin, vmax, ncalc)

            blocks = build_blocks(
                wavecalc, ll_win.nu, wn_approx_window=wn_approx_window
            )
            kabs = np.asarray(
                lbl_cross_section(
                    ll_win, blocks, np.array([t]), np.array([p]),
                    np.array([amb_frac]), lineshape=lineshape,
                    wn_calc_window=wn_calc_window,
                    wn_approx_window=wn_approx_window,
                    include_pressure_shift=include_pressure_shift,
                )
            )[:, 0]

            dfine = wavecalc[1] - wavecalc[0]
            for iw, wc in enumerate(wave):
                mask = (wavecalc >= wc - delwave / 2.0) & (
                    wavecalc <= wc + delwave / 2.0
                )
                ksel = np.sort(kabs[mask])
                g_sorted = np.cumsum(np.full(ksel.size, dfine))
                g_sorted /= g_sorted[-1]
                k_g[iw, :, ip, it] = np.interp(g_ord, g_sorted, ksel)

    return k_g, g_ord, del_g


def _chunk_launch(ll_win, press_atm, temp, wave, amb_frac, lineshape,
                  wn_calc_window, wn_approx_window, include_pressure_shift,
                  fine_points_cap, device=None):
    """Device phase of one wavenumber chunk: synthesise fine-grid
    cross-sections for the WHOLE (P,T) grid in a single batched kernel
    evaluation.  Returns the UNMATERIALISED device array plus the rebin
    metadata — dispatch is async, so launching several chunks on
    different ``device``s overlaps their synthesis across a mesh.
    """
    from archnemesis_tpu.constants import C_LIGHT_CGS, K_B_CGS, N_AVOGADRO

    delwave = wave[1] - wave[0] if wave.size > 1 else wave[0] * 0 + 1.0
    vmin = wave[0] - delwave / 2.0
    vmax = wave[-1] + delwave / 2.0

    ll_c = _slice_lines(
        ll_win, vmin - 2.0 * wn_approx_window, vmax + 2.0 * wn_approx_window
    )
    npress, ntemp = len(press_atm), len(temp)
    pp, tt = np.meshgrid(press_atm, temp, indexing="ij")
    pcol, tcol = pp.ravel(), tt.ravel()

    # shared fine grid: the finest adaptive resolution over the whole
    # (P,T) grid (min Voigt HWHM / 5, reference :3617-3624) — at least as
    # fine as the reference's per-point grids
    doppler_const = (1.0 / C_LIGHT_CGS) * np.sqrt(
        2.0 * np.log(2.0) * N_AVOGADRO * K_B_CGS
    )
    delv_calc = np.inf
    for p, t in zip(pcol, tcol):
        alpha_d = doppler_const * ll_c.nu * np.sqrt(t / ll_c.mass)
        t_ratio = ll_c.t_ref / t
        gam = (
            t_ratio ** ll_c.broad[1] * ll_c.broad[0] * (1.0 - amb_frac)
            + t_ratio ** ll_c.broad[4] * ll_c.broad[3] * amb_frac
        ) * (p / ll_c.p_ref)
        hwhm = 0.5346 * gam + np.sqrt(0.2166 * gam**2 + alpha_d**2)
        delv_calc = min(delv_calc, float(np.min(hwhm)) / 5.0)
    ncalc = min(int((vmax - vmin) / delv_calc), fine_points_cap)
    # empty-bin guard: fine_points_cap truncation (or a min-HWHM/5 coarser
    # than delwave on sparse high-pressure decks) can otherwise leave a
    # conv bin with <1 fine point, breaking g_sorted[-1]/wavecalc[1]
    ncalc = max(ncalc, 2 * len(wave) + 2)
    wavecalc = np.linspace(vmin, vmax, ncalc)
    dfine = wavecalc[1] - wavecalc[0]

    blocks = build_blocks(wavecalc, ll_c.nu,
                          wn_approx_window=wn_approx_window)
    tcol_d, pcol_d, amb_d = tcol, pcol, np.full(pcol.size, amb_frac)
    if device is not None:
        import jax

        tcol_d = jax.device_put(tcol_d, device)
        pcol_d = jax.device_put(pcol_d, device)
        amb_d = jax.device_put(amb_d, device)
    kabs = lbl_cross_section(
        ll_c, blocks, tcol_d, pcol_d, amb_d,
        lineshape=lineshape, wn_calc_window=wn_calc_window,
        wn_approx_window=wn_approx_window,
        include_pressure_shift=include_pressure_shift,
    )  # (NCALC, NP*NT) device array, NOT materialised
    return kabs, wavecalc, dfine, delwave, vmin, vmax, npress, ntemp


def _chunk_rebin(kabs, wavecalc, dfine, delwave, vmin, vmax, npress, ntemp,
                 wave, ng, g_ord):
    """Host phase of one chunk: sort the fine-grid cross-sections per conv
    bin into g-space and interpolate onto the Gauss-Legendre g ordinates
    (vectorised over all (P,T) columns at once)."""
    k_g = np.zeros((len(wave), ng, npress, ntemp))
    for iw, wc in enumerate(wave):
        lo = np.searchsorted(wavecalc, wc - delwave / 2.0, side="left")
        hi = np.searchsorted(wavecalc, wc + delwave / 2.0, side="right")
        if hi - lo < 1:
            raise ValueError(
                f"k-table bin {iw} ({wc:.6g} cm-1, chunk "
                f"[{vmin:.6g},{vmax:.6g}]) contains no fine-grid points; "
                "raise fine_points_cap"
            )
        ksel = np.sort(kabs[lo:hi], axis=0)  # (NBIN, NP*NT)
        if hi - lo == 1:
            k_g[iw] = np.broadcast_to(
                ksel[0], (ng,) + ksel.shape[1:]
            ).reshape(ng, npress, ntemp)
            continue
        g_sorted = np.cumsum(np.full(hi - lo, dfine))
        g_sorted /= g_sorted[-1]
        # vectorised np.interp over all (P,T) columns at once: the g knots
        # are shared, so one searchsorted + lerp replaces the per-column
        # host loop (the rebin was the host-side hot spot at production
        # bin x (P,T) counts)
        idx = np.clip(np.searchsorted(g_sorted, g_ord), 1,
                      g_sorted.size - 1)
        x0, x1 = g_sorted[idx - 1], g_sorted[idx]
        w = np.clip((g_ord - x0) / (x1 - x0), 0.0, 1.0)[:, None]
        interp = (1.0 - w) * ksel[idx - 1] + w * ksel[idx]  # (ng, NP*NT)
        k_g[iw] = interp.reshape(ng, npress, ntemp)
    return k_g


def generate_ktable_chunked(
    ll: LineList,
    press_atm: np.ndarray,
    temp: np.ndarray,
    wave: np.ndarray,
    ng: int,
    n_chunks: int = 1,
    amb_frac: float = 1.0,
    lineshape: str = "voigt",
    wn_calc_window: float = 25.0,
    wn_approx_window: float = 75.0,
    include_pressure_shift: bool = True,
    fine_points_cap: int = 2_000_000,
    devices=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Wavenumber-chunked, (P,T)-batched k-table pipeline — the
    production-scale counterpart of ``generate_ktable`` and of the
    reference's joblib-threaded chunking (calc_ktable n_chunks,
    Spectroscopy_0.py:3355,3528-3534). Each chunk fetches its own
    line window (2x approx pad, :3590-3596) and synthesises cross-sections
    for the WHOLE (P,T) grid in one device-batched kernel call.

    ``devices`` (e.g. ``jax.devices()``) fans the chunks out round-robin:
    all launches are dispatched asynchronously FIRST — one in-flight
    synthesis per device, overlapping across the mesh — and the host
    rebins each chunk's result as it completes (the reference's joblib
    thread pool, Spectroscopy_0.py:3528, re-expressed as async device
    dispatch).  ``devices=None`` keeps everything on the default device,
    still overlapping chunk k+1's synthesis with chunk k's host rebin.

    Returns (k_g, g_ord, del_g) with k_g (NWAVE, NG, NP, NT).
    """
    g_ord, del_g = gauss_legendre_g(ng)
    launches = []
    for i, idx in enumerate(np.array_split(np.arange(len(wave)), n_chunks)):
        if idx.size == 0:
            continue
        dev = devices[i % len(devices)] if devices else None
        launches.append((idx, _chunk_launch(
            ll, press_atm, temp, wave[idx], amb_frac, lineshape,
            wn_calc_window, wn_approx_window, include_pressure_shift,
            fine_points_cap, device=dev,
        )))
    parts = []
    for idx, (kabs, wavecalc, dfine, delwave, vmin, vmax, np_, nt_) in launches:
        parts.append(_chunk_rebin(
            np.asarray(kabs), wavecalc, dfine, delwave, vmin, vmax,
            np_, nt_, wave[idx], ng, g_ord,
        ))
    return np.concatenate(parts, axis=0), g_ord, del_g
