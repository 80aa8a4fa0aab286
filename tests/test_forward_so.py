"""Solar-occultation (limb transmission) forward model vs the reference.

Golden (tests/goldens/mars_so_fm.npz, tools/gen_so_fixture.py): the
reference nemesisSOfm on the Mars CO deck (single-HDF5 run format, LBL
tables, 15 tangent heights, Gaussian ILS FWHM=0.16) with synthetic .lta
tables. Covers: HDF5 deck loading, LAYTYP=5 layering at LAYANG=90, limb
path construction + scale factors, monochromatic LBL opacity, the
all-tangent-paths-in-one-evaluation transmission batch, tangent-height
interpolation, and Gaussian lblconv.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.enums import InstrumentLineshape
from archnemesis_tpu.forward import forward_so, make_forward_config, so_geometry
from archnemesis_tpu.io.hdf5 import load_deck_hdf5
from archnemesis_tpu.ops.convolution import apply_ils, ils_weights_lbl
from archnemesis_tpu.retrieval.statevector import apply_state, read_apr

DECK = "tests/fixtures/mars_so"
GOLDEN = "tests/goldens/mars_so_fm.npz"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    deck = load_deck_hdf5(f"{DECK}/mars_solocc.h5")

    sv = read_apr(f"{DECK}/mars_solocc.apr", deck.atmosphere)
    atm = apply_state(deck.atmosphere, sv.xa, sv, adjust_hydrostat=False)

    wave = d["WAVE"]
    kt = deck.ktables
    sel = np.where(
        (np.asarray(kt.wave) >= wave.min()) & (np.asarray(kt.wave) <= wave.max())
    )[0]
    ktw = kt.replace(wave=np.asarray(kt.wave)[sel], k=np.asarray(kt.k)[:, sel])
    np.testing.assert_allclose(np.asarray(ktw.wave), wave, rtol=0, atol=1e-5)

    cfg = make_forward_config(
        atm, ktw, None, iray=deck.settings.iray, ispace=deck.settings.ispace,
        gasgiant=True,
    )
    geo = so_geometry(atm, deck.layer_config, d["TANHE"])
    spec, diag = forward_so(
        atm, deck.layer_config, ktw, None, deck.aerosol, cfg, geo,
        return_diagnostics=True,
    )
    return d, deck, np.asarray(spec), diag


def test_layering_and_paths(setup):
    d, _, _, diag = setup
    np.testing.assert_allclose(
        np.asarray(diag["layers"].baseh), d["BASEH"], rtol=1e-8
    )
    # path scale factors: golden SCALE is (NLAYIN_max, NPATH) padded
    paths = diag["paths"]
    nlayin = d["NLAYIN"]
    for ip in range(paths.npath):
        n = int(nlayin[ip])
        np.testing.assert_allclose(
            np.asarray(paths.scale)[:n, ip], d["SCALE"][:n, ip], rtol=1e-7,
            err_msg=f"path {ip}",
        )
        np.testing.assert_array_equal(
            np.asarray(paths.layinc)[:n, ip], d["LAYINC"][:n, ip]
        )


@pytest.mark.parametrize("name,key", [("taugas", "TAUGAS"), ("tautot", "TAUTOT")])
def test_layer_taus(setup, name, key):
    d, _, _, diag = setup
    want = d[key]
    got = np.asarray(diag[name])
    atol = 1e-12 * np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol, err_msg=name)


def test_convolved_transmission(setup):
    d, deck, spec, _ = setup
    nconv = int(d["NCONV"][0])
    vconv = d["VCONV"][:nconv, 0]
    w = ils_weights_lbl(
        d["WAVE"], vconv, deck.geometry.fwhm,
        InstrumentLineshape(deck.settings.ishape),
    )
    got = np.asarray(apply_ils(jnp.asarray(w), jnp.asarray(spec)))
    want = d["SPECONV"][:nconv, :]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-10)
