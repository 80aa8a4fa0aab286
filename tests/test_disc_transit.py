"""Disc-averaging quadrature + primary-transit forward model vs reference.

Goldens (tools/gen_disc_transit_golden.py):
- disc_quadrature.npz: reference calc_avepoints_exoplanet tables (exact
  algorithm parity expected).
- mars_transit_fm.npz: reference nemesisPTfm transit-depth spectrum on the
  mars_so LBL deck (trapezoid annulus integral over tangent heights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.rt.disc import disc_quadrature

QUAD_GOLDEN = "tests/goldens/disc_quadrature.npz"
TRANSIT_GOLDEN = "tests/goldens/mars_transit_fm.npz"
DECK = "tests/fixtures/mars_so"


def test_disc_quadrature_matches_reference():
    d = np.load(QUAD_GOLDEN)
    for i in range(int(d["ncases"])):
        nmu = int(d[f"case{i}_nmu"])
        phase = float(d[f"case{i}_phase"])
        q = disc_quadrature(nmu=nmu, phase=phase)
        np.testing.assert_allclose(q["flat"], d[f"case{i}_flat"], atol=1e-9,
                                   err_msg=f"case {i} lat")
        np.testing.assert_allclose(q["flon"], d[f"case{i}_flon"], atol=1e-9)
        np.testing.assert_allclose(q["sol_ang"], d[f"case{i}_sol"], atol=1e-9)
        np.testing.assert_allclose(q["emiss_ang"], d[f"case{i}_emiss"],
                                   atol=1e-9)
        np.testing.assert_allclose(q["azi_ang"], d[f"case{i}_azi"], atol=1e-9)
        np.testing.assert_allclose(q["wgeom"], d[f"case{i}_wgeom"],
                                   rtol=1e-12)
        assert abs(q["wgeom"].sum() - 1.0) < 1e-12


@pytest.fixture(scope="module")
def transit_setup():
    from archnemesis_tpu.enums import SpectralCalculationMode
    from archnemesis_tpu.forward import forward_transit, make_forward_config
    from archnemesis_tpu.io.hdf5 import load_deck_hdf5
    from archnemesis_tpu.ops.convolution import conv_channel_interp
    from archnemesis_tpu.retrieval.statevector import apply_state, read_apr

    d = np.load(TRANSIT_GOLDEN)
    deck = load_deck_hdf5(f"{DECK}/mars_solocc.h5")
    sv = read_apr(f"{DECK}/mars_solocc.apr", deck.atmosphere)
    # nemesisPTfm runs subprofretg WITH hydrostatic rebalance
    # (ForwardModel_0.py:1899 adjust_hydrostat=True), unlike SO
    atm = apply_state(deck.atmosphere, sv.xa, sv, adjust_hydrostat=True)

    kt = deck.ktables
    sel = np.where(
        (np.asarray(kt.wave) >= d["WAVE"].min())
        & (np.asarray(kt.wave) <= d["WAVE"].max())
    )[0]
    ktw = kt.replace(wave=np.asarray(kt.wave)[sel],
                     k=np.asarray(kt.k)[:, sel])
    cfg = make_forward_config(
        atm, ktw, deck.cia, iray=deck.settings.iray,
        ispace=deck.settings.ispace, gasgiant=True,
    )
    depth = forward_transit(
        atm, deck.layer_config, ktw, deck.cia, None, cfg,
        stellar_radius_km=float(d["STELLAR_RADIUS_KM"]),
    )
    from archnemesis_tpu.enums import InstrumentLineshape
    from archnemesis_tpu.ops.convolution import apply_ils, ils_weights_lbl

    w = ils_weights_lbl(
        np.asarray(ktw.wave), d["VCONV"], deck.geometry.fwhm,
        InstrumentLineshape(deck.settings.ishape),
    )
    conv = apply_ils(w, depth)
    return d, np.asarray(conv), atm, deck, ktw, cfg


def test_transit_depth_matches_reference(transit_setup):
    d, conv, *_ = transit_setup
    want = d["SPECONV"][:, 0]
    np.testing.assert_allclose(conv, want, rtol=1e-5)


def test_transit_jacobian_finite(transit_setup):
    from archnemesis_tpu.forward import forward_transit

    d, _, atm, deck, ktw, cfg = transit_setup

    def f(tscale):
        a2 = atm.replace(t=atm.t * tscale)
        return forward_transit(
            a2, deck.layer_config, ktw, deck.cia, None, cfg,
            stellar_radius_km=float(d["STELLAR_RADIUS_KM"]),
        ).sum()

    g = jax.grad(f)(jnp.asarray(1.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_forward_disc_equals_weighted_sum():
    """forward_disc's vmapped batch must equal the explicit per-ray
    weighted sum of nadir evaluations (reference nemesisdiscfm semantics,
    ForwardModel_0.py:1668-1674)."""
    import __graft_entry__ as ge
    from archnemesis_tpu.forward import forward_disc, forward_nadir

    atm, laycfg, ktab, surf, cfg = ge._tiny_problem()
    q = disc_quadrature(nmu=2, phase=0.0)
    disc = np.asarray(
        forward_disc(atm, laycfg, ktab, None, None, surf, cfg, q)
    )
    manual = 0.0
    for i in range(q["wgeom"].size):
        s = forward_nadir(
            atm, laycfg, ktab, None, None, surf, cfg,
            emiss_ang=q["emiss_ang"][i], sol_ang=q["sol_ang"][i],
            azi_ang=q["azi_ang"][i],
        )[:, 0]
        manual = manual + q["wgeom"][i] * np.asarray(s)
    np.testing.assert_allclose(disc, manual, rtol=1e-10)
    assert np.all(np.isfinite(disc)) and disc.max() > 0
