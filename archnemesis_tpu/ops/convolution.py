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


def ils_weights_filter(wave: np.ndarray, vconv: np.ndarray,
                       nfil: np.ndarray, vfil: np.ndarray,
                       afil: np.ndarray) -> np.ndarray:
    """(NCONV, NWAVE) weights from per-channel tabulated filter functions
    (.fil files, FWHM<0), reproducing the reference numba lblconv_fil kernel
    (Measurement_0.py:3549): linear-interp the filter onto the calc-grid
    points inside its span, keep f>0, normalise by the sum.
    """
    nconv = vconv.shape[0]
    out = np.zeros((nconv, wave.shape[0]))
    for j in range(nconv):
        n = int(nfil[j])
        xp, yp = vfil[:n, j], afil[:n, j]
        sel = np.where((wave >= xp[0]) & (wave <= xp[-1]))[0]
        f = np.interp(wave[sel], xp, yp)
        f = np.where(f > 0.0, f, 0.0)
        s = f.sum()
        if s > 0:
            out[j, sel] = f / s
    return out


def double_gauss_ils_weights(wave, vconv, offset, fwhm, amp, xdist=5.0):
    """Differentiable (NCONV, NWAVE) ILS weights for a per-channel
    double-Gaussian lineshape (ACS-MIR models 228/229/230).

    TPU-first reformulation of the reference's two-step construction
    (model_229.py:141-190 builds per-channel sampled filters with ngauss,
    then lblconv_fil linearly re-interpolates them onto the calc grid): the
    Gaussians are evaluated *directly* at the calc-grid wavenumbers — the
    exact limit of the reference's sample-then-interp — with the same
    xdist * FWHM/2 per-Gaussian support window, then row-normalised. All
    jnp, so jacfwd differentiates through the ILS parameters.

    Parameters: wave (NW,), vconv (NC,), offset/fwhm/amp (NC, NG).
    """
    wave = jnp.asarray(wave)
    vconv = jnp.asarray(vconv)
    mean = vconv[:, None, None] + offset[:, :, None]  # (NC, NG, 1)
    sig = fwhm[:, :, None] / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    d = wave[None, None, :] - mean
    gauss = amp[:, :, None] * jnp.exp(-0.5 * (d / sig) ** 2)
    support = jnp.abs(d) <= (xdist * 0.5 * fwhm[:, :, None])
    f = jnp.sum(jnp.where(support, gauss, 0.0), axis=1)  # (NC, NW)
    f = jnp.where(f > 0.0, f, 0.0)
    return f / jnp.sum(f, axis=1, keepdims=True)
