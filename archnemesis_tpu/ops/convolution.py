"""Instrument-lineshape convolution of calculated spectra.

Mirrors the reference Measurement convolution entry points
(``Measurement_0.py``: conv :2288, lblconv :2125, numba kernels :3335+):

- FWHM == 0: channel-integrator mode — k-tables already include the filter;
  just interpolate the calc grid onto the convolution wavelengths.
- FWHM > 0: square/triangular/Gaussian ILS — precomputed banded weight
  matrix applied as a matmul (TPU-friendly; replaces the per-channel loops).
- FWHM < 0: per-channel filter functions (.fil) — weight matrix built from
  the tabulated filters.

All weight matrices are built host-side (static grids) and applied as a
single (NCONV, NWAVE) @ (NWAVE, ...) contraction.
"""

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.enums import InstrumentLineshape
from archnemesis_tpu.utils.interp import interp1d_extrap


def conv_channel_interp(wave, spec, vconv):
    """FWHM=0 channel mode: linear interpolation onto vconv
    (Measurement_0.py conv:2428-2434)."""
    return interp1d_extrap(wave, spec, vconv)


def ils_weights_lbl(wave: np.ndarray, vconv: np.ndarray, fwhm: float,
                    ishape: InstrumentLineshape) -> np.ndarray:
    """(NCONV, NWAVE) weights reproducing the reference numba lblconv kernel
    (Measurement_0.py:3335) exactly: discrete ILS samples at the calc-grid
    points inside the window, normalised by their sum (no quadrature
    weighting).
    """
    nconv = vconv.shape[0]
    nwave = wave.shape[0]
    out = np.zeros((nconv, nwave))
    for ic in range(nconv):
        vc = vconv[ic]
        if ishape == InstrumentLineshape.Square:
            v1, v2 = vc - 0.5 * fwhm, vc - 0.5 * fwhm + fwhm
            fn = lambda w: np.ones_like(w)
        elif ishape == InstrumentLineshape.Triangular:
            v1, v2 = vc - fwhm, vc + fwhm
            fn = lambda w: 1.0 - np.abs(w - vc) / fwhm
        elif ishape == InstrumentLineshape.Gaussian:
            sig = 0.5 * fwhm / np.sqrt(np.log(2.0))
            v1, v2 = vc - 3.0 * sig, vc + 3.0 * sig
            fn = lambda w: np.exp(-(((w - vc) / sig) ** 2))
        else:
            raise NotImplementedError(f"ISHAPE {ishape} not implemented")
        sel = np.where((wave >= v1) & (wave <= v2))[0]
        a = fn(wave[sel])
        a = np.where(a > 0.0, a, 0.0)  # reference only accumulates f1 > 0
        out[ic, sel] = a / a.sum()
    return out


def apply_ils(weights, spec):
    """Apply a (NCONV, NWAVE) ILS weight matrix to spec (NWAVE, ...)."""
    return jnp.tensordot(jnp.asarray(weights), spec, axes=([1], [0]))
