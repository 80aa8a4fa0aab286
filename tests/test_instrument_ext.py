"""Instrument-model extensions: Doppler shift, Hamming ILS, filter
integration (IFORM=6), and the k-table FWHM>0 spline-quadrature conv.

Oracle comparisons run the reference Measurement_0 directly where its code
path is sound (doppler, integrate_filter). The reference's conv() FWHM>0
trapezoid and Hamming window are numerically broken there (see the
docstrings in ops/convolution.py), so those are validated analytically:
boxcar-averaging polynomials a cubic spline reproduces exactly, and ILS
normalisation/symmetry invariants.
"""

import numpy as np
import pytest

from archnemesis_tpu.enums import InstrumentLineshape
from archnemesis_tpu.ops.convolution import (
    conv_quad_weights,
    doppler_corrected_wave,
    ils_weights_lbl,
    integrate_filter_apply,
    integrate_filter_weights,
    invert_doppler_shift,
)


def _oracle_measurement(nconv, ngeom=1):
    from tools.refutils import import_reference

    ans = import_reference()
    m = ans.Measurement_0(runname="t", NGEOM=ngeom)
    m.NCONV = np.full(ngeom, nconv, dtype="int32")
    return ans, m


@pytest.fixture(scope="module")
def filt():
    rng = np.random.default_rng(7)
    wave = np.linspace(1200.0, 1210.0, 801)
    spec = 1.0 + 0.3 * np.sin(wave) + 0.05 * rng.standard_normal(wave.size)
    vconv = np.array([1202.0, 1205.0, 1208.0])
    nfil = np.array([21, 31, 11], dtype="int32")
    nmax = nfil.max()
    vfil = np.zeros((nmax, 3))
    afil = np.zeros((nmax, 3))
    for j, hw in enumerate([0.8, 1.2, 0.5]):
        n = nfil[j]
        vfil[:n, j] = np.linspace(vconv[j] - hw, vconv[j] + hw, n)
        afil[:n, j] = np.exp(-(((vfil[:n, j] - vconv[j]) / (0.5 * hw)) ** 2))
    return wave, spec, vconv, nfil, vfil, afil


def test_doppler_shift_matches_oracle():
    ans, m = _oracle_measurement(3)
    wave = np.linspace(1000.0, 1100.0, 11)
    for ispace in (0, 1):
        m.ISPACE = ans.WaveUnitEnum(ispace)
        m.V_DOPPLER = 12.5
        np.testing.assert_allclose(
            doppler_corrected_wave(wave, 12.5, ispace),
            m.correct_doppler_shift(wave), rtol=1e-14)
        np.testing.assert_allclose(
            invert_doppler_shift(wave, 12.5, ispace),
            m.invert_doppler_shift(wave), rtol=1e-14)
        # round trip
        np.testing.assert_allclose(
            invert_doppler_shift(
                doppler_corrected_wave(wave, 12.5, ispace), 12.5, ispace),
            wave, rtol=1e-14)


def test_integrate_filter_matches_oracle(filt):
    wave, spec, vconv, nfil, vfil, afil = filt
    ans, m = _oracle_measurement(vconv.size)
    m.ISPACE = ans.WaveUnitEnum(0)
    m.V_DOPPLER = 3.0
    m.FWHM = -1.0
    m.VCONV = vconv[:, None]
    m.NFIL, m.VFIL, m.AFIL = nfil, vfil, afil
    want = m.integrate_filter(wave, spec, IGEOM=0)

    got = np.asarray(integrate_filter_apply(
        wave, spec, nfil, vfil, afil, v_doppler=3.0, ispace=0))
    np.testing.assert_allclose(got, want, rtol=1e-10)

    # static weight-matrix variant agrees on the corrected grid
    wc = doppler_corrected_wave(wave, 3.0, 0)
    w = integrate_filter_weights(wc, vconv, nfil, vfil, afil)
    np.testing.assert_allclose(w @ spec, want, rtol=1e-10)


def test_integrate_filter_differentiable_in_doppler(filt):
    import jax
    import jax.numpy as jnp

    wave, spec, vconv, nfil, vfil, afil = filt
    # fixed nominal so every evaluation shares the same membership set; the
    # linearisation point is off-knot (at v=0 the synthetic calc grid lands
    # exactly on filter knots, where interp's one-sided AD slope and the
    # two-sided FD legitimately disagree)
    f = lambda v: jnp.sum(integrate_filter_apply(
        wave, jnp.asarray(spec), nfil, vfil, afil, v_doppler=v, ispace=0,
        v_doppler_nominal=3.0))
    g = jax.grad(f)(3.0)
    fd = (f(3.0 + 0.05) - f(3.0 - 0.05)) / 0.1
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=2e-2)


def test_hamming_ils_normalised_symmetric_peaked():
    wave = np.linspace(95.0, 105.0, 2001)
    w = ils_weights_lbl(wave, np.array([100.0]), 1.0,
                        InstrumentLineshape.Hamming)[0]
    assert w.sum() == pytest.approx(1.0)
    ic = np.argmax(w)
    assert wave[ic] == pytest.approx(100.0)
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)
    # FWHM property: ILS falls to ~half its peak one half-width out
    half = np.interp(100.5, wave, w)
    assert half == pytest.approx(0.5 * w[ic], rel=0.05)
    # support clipped to +-1.1 FWHM
    assert w[wave < 98.89].sum() == 0.0


def test_hanning_unimplemented_like_reference():
    wave = np.linspace(95.0, 105.0, 101)
    with pytest.raises(NotImplementedError):
        ils_weights_lbl(wave, np.array([100.0]), 1.0,
                        InstrumentLineshape.Hanning)


def test_conv_quad_boxcar_exact_on_cubic():
    # cubic spline through a cubic is exact, and the trapezoid of a cubic
    # over 20 points is accurate to ~1e-5 relative — the boxcar average of
    # y=x^3 over [c-f/2, c+f/2] is c^3 + c f^2 / 4
    wave = np.linspace(0.0, 10.0, 401)
    y = wave**3
    vconv = np.array([3.0, 5.0, 7.5])
    fwhm = 0.8
    w = conv_quad_weights(wave, vconv, fwhm)
    want = vconv**3 + vconv * fwhm**2 / 4.0
    np.testing.assert_allclose(w @ y, want, rtol=1e-4)


def test_conv_quad_edge_extrapolation_linear():
    # channels whose window spills past the grid edge use linear
    # extrapolation; a linear spectrum must convolve exactly to itself
    wave = np.linspace(0.0, 10.0, 101)
    y = 2.0 + 3.0 * wave
    vconv = np.array([0.05, 9.95])
    w = conv_quad_weights(wave, vconv, 0.5)
    np.testing.assert_allclose(w @ y, 2.0 + 3.0 * vconv, rtol=1e-9)


def test_conv_quad_variable_fwhm():
    # .fwh table: wider window at the second channel changes the average
    wave = np.linspace(0.0, 10.0, 401)
    y = wave**2  # boxcar average of x^2 is c^2 + f^2/12
    vconv = np.array([4.0, 6.0])
    vf = np.array([0.0, 10.0])
    xf = np.array([0.6, 1.8])
    w = conv_quad_weights(wave, vconv, 1.0, vfwhm=vf, xfwhm=xf)
    fw = np.interp(vconv, vf, xf)
    np.testing.assert_allclose(w @ y, vconv**2 + fw**2 / 12.0, rtol=1e-4)


def test_read_fwh(tmp_path):
    from archnemesis_tpu.io.legacy import read_fwh

    p = tmp_path / "t.fwh"
    p.write_text("3\n100.0 0.5\n200.0 0.6\n300.0 0.8\n")
    vf, xf = read_fwh(str(p))
    np.testing.assert_allclose(vf, [100.0, 200.0, 300.0])
    np.testing.assert_allclose(xf, [0.5, 0.6, 0.8])
