"""AOTF multi-diffraction-order SO forward model vs the reference.

Golden (tests/goldens/mars_so_aotf_fm.npz, tools/gen_aotf_golden.py): the
reference nemesisSOfm AOTF branch on the Mars CO deck with 3 synthetic
diffraction orders (shifted channel grids, sinc^2-like order
transmissions). Covers the per-order window/forward/convolve loop, the
TRANS_AOTF weighting and the weight normalisation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.enums import InstrumentLineshape
from archnemesis_tpu.forward import (
    forward_so_aotf,
    make_forward_config,
    so_geometry,
)
from archnemesis_tpu.io.hdf5 import load_deck_hdf5
from archnemesis_tpu.ops.convolution import apply_ils, ils_weights_lbl
from archnemesis_tpu.retrieval.statevector import apply_state, read_apr

DECK = "tests/fixtures/mars_so"
GOLDEN = "tests/goldens/mars_so_aotf_fm.npz"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    deck = load_deck_hdf5(f"{DECK}/mars_solocc.h5")

    # golden uses unit scaling factors (the reference's AOTF loop compounds
    # in-place profile scalings across orders; see tools/gen_aotf_golden.py)
    sv = read_apr(f"{DECK}/mars_solocc.apr", deck.atmosphere)
    atm = apply_state(
        deck.atmosphere, np.ones_like(sv.xa), sv, adjust_hydrostat=False
    )

    norders = d["VCONV_AOTF"].shape[2]
    nconv = int(d["NCONV"][0])
    kt = deck.ktables
    ishape = InstrumentLineshape(deck.settings.ishape)
    fwhm = deck.geometry.fwhm

    ktab_orders, cfg_orders, conv_orders = [], [], []
    for o in range(norders):
        wave_o = d[f"WAVE_O{o}"]
        sel = np.where(
            (np.asarray(kt.wave) >= wave_o.min() - 1e-9)
            & (np.asarray(kt.wave) <= wave_o.max() + 1e-9)
        )[0]
        ktw = kt.replace(
            wave=np.asarray(kt.wave)[sel], k=np.asarray(kt.k)[:, sel]
        )
        np.testing.assert_allclose(
            np.asarray(ktw.wave), wave_o, rtol=0, atol=1e-5
        )
        ktab_orders.append(ktw)
        cfg_orders.append(
            make_forward_config(
                atm, ktw, None, iray=deck.settings.iray,
                ispace=deck.settings.ispace, gasgiant=True,
            )
        )
        vconv_o = d["VCONV_AOTF"][:nconv, 0, o]
        w = ils_weights_lbl(wave_o, vconv_o, fwhm, ishape)
        conv_orders.append(
            lambda wv, s, w=jnp.asarray(w): apply_ils(w, s)
        )

    geo = so_geometry(atm, deck.layer_config, d["TANHE"])
    spec = forward_so_aotf(
        atm, deck.layer_config, ktab_orders, None, deck.aerosol,
        cfg_orders, geo, conv_orders, d["TRANS_AOTF"],
    )
    return d, np.asarray(spec)


def test_aotf_combined_spectrum(setup):
    d, got = setup
    nconv = int(d["NCONV"][0])
    want = d["SPECONV"][:nconv, :]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-10)
