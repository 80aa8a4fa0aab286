"""Retrieval-driver wiring for scattering decks: make_retrieval_setup on the
Jupiter multiple-scattering deck (ISCAT=1) builds a differentiable forward
function through the adding-doubling core and the .apr models (47 cloud,
444 retrieved Mie optics), replacing the reference's forced numeric
Jacobian for scattering runs (ForwardModel_0.py:2251-2252).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.retrievals import make_retrieval_setup

DECK = "tests/fixtures/jupiter_scatter"


@pytest.fixture(scope="module")
def setup():
    return make_retrieval_setup(DECK, "cirstest")


def test_forward_finite_and_shaped(setup):
    y0 = np.asarray(setup.forward_fn(jnp.asarray(setup.sv.xa)))
    assert y0.shape == setup.y.shape
    assert np.all(np.isfinite(y0))
    assert np.all(y0 > 0.0)  # solar-reflected radiance

    # under JIT too (r5 regression): jnp-built "static" grids become
    # tracers inside a jit trace, which broke model 444's host-side Mie
    # series-cap derivation (float(np.max(radii))) — eager-only coverage
    # missed it; every production caller jits this function
    yj = np.asarray(jax.jit(setup.forward_fn)(jnp.asarray(setup.sv.xa)))
    np.testing.assert_allclose(yj, y0, rtol=5e-7)


@pytest.mark.slow
def test_jacfwd_through_scattering(setup):
    kk = np.asarray(
        jax.jacfwd(setup.forward_fn)(jnp.asarray(setup.sv.xa))
    )
    assert kk.shape == (setup.y.size, setup.sv.nx)
    assert np.all(np.isfinite(kk))
    # every retrieved variable must influence the spectrum somewhere
    assert np.all(np.abs(kk).max(axis=0) > 0.0)


def test_iform_fluxratio_through_scattering_driver(setup):
    """IFORM FluxRatio / Integrated_spectral_power for nadir multiple
    scattering (reference applies xfac inside
    calculate_multiple_scattering_spectrum, ForwardModel_0.py:4360-4373):
    the driver accepts the units and the spectrum scales by the same
    _iform_xfac the disc/transit drivers are oracle-tested with."""
    import dataclasses

    from archnemesis_tpu.enums import SpectraUnit
    from archnemesis_tpu.io.legacy import load_deck
    from archnemesis_tpu.retrievals import _iform_xfac

    deck = load_deck(DECK, "cirstest")
    y_rad = np.asarray(setup.forward_fn(jnp.asarray(setup.sv.xa)))

    import archnemesis_tpu.retrievals as drv

    orig = drv.load_deck

    def load_with_iform(iform):
        def loader(d, r):
            dk = orig(d, r)
            return dataclasses.replace(
                dk, settings=dataclasses.replace(dk.settings, iform=iform)
            )
        return loader

    for iform in (SpectraUnit.FluxRatio,
                  SpectraUnit.Integrated_spectral_power):
        drv.load_deck = load_with_iform(iform)
        try:
            s2 = drv.make_retrieval_setup(DECK, "cirstest")
        finally:
            drv.load_deck = orig
        y2 = np.asarray(s2.forward_fn(jnp.asarray(s2.sv.xa)))
        # compare on the channel grid: conv of (spec * xfac) vs
        # conv(spec) * xfac(vconv) — xfac is smooth, FWHM=0 deck uses
        # channel interpolation, so the two commute exactly
        vconv = s2.vconv_list[0]
        xfac = _iform_xfac(iform, deck.atmosphere, deck.stellar, vconv)
        xfac = np.asarray(xfac) * np.ones_like(vconv)
        # Integrated_spectral_power: scalar xfac commutes exactly with the
        # channel interpolation; FluxRatio: xfac(wave)=c/solpspec(wave) is
        # applied on the CALC grid (as the reference does) so it commutes
        # with the interpolation only up to solpspec's curvature across a
        # channel spacing
        if iform == SpectraUnit.Integrated_spectral_power:
            np.testing.assert_allclose(y2, y_rad * xfac, rtol=1e-10)
        else:
            # edge channels sit between calc-grid points whose solpspec
            # interpolation can differ wildly right at the stellar-grid
            # boundary (the reference shares this calc-grid behaviour);
            # compare the interior
            np.testing.assert_allclose(
                y2[1:-1], (y_rad * xfac)[1:-1], rtol=2e-2
            )
