"""End-to-end nadir single-scattering forward model vs the reference.

Golden (tests/goldens/jupiter_singlescat_fm.npz,
tools/gen_singlescat_fixture.py): the reference nemesisfm with
ISCAT=SINGLE_SCATTERING_PLANE_PARALLEL on the Jupiter scattering deck.
"""

import numpy as np
import pytest

from archnemesis_tpu.forward import forward_singlescat_nadir, make_forward_config
from archnemesis_tpu.io.legacy import load_deck
from archnemesis_tpu.ops.convolution import conv_channel_interp

DECK = "tests/fixtures/jupiter_scatter"
GOLDEN = "tests/goldens/jupiter_singlescat_fm.npz"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    deck = load_deck(DECK, "cirstest")
    st = deck.settings

    wave = d["WAVE"]
    kt = deck.ktables
    sel = np.where(
        (np.asarray(kt.wave) >= wave.min()) & (np.asarray(kt.wave) <= wave.max())
    )[0]
    ktw = kt.replace(wave=np.asarray(kt.wave)[sel], k=np.asarray(kt.k)[:, sel])

    cfg = make_forward_config(
        deck.atmosphere, ktw, deck.cia, iray=st.iray, ispace=st.ispace,
        gasgiant=deck.surface.gasgiant,
    )
    g = deck.geometry
    spec = forward_singlescat_nadir(
        deck.atmosphere, deck.layer_config, ktw, deck.cia, deck.aerosol,
        deck.surface, deck.stellar, cfg, deck.hgphase,
        emiss_ang=g.emiss_ang[0, 0], sol_ang=g.sol_ang[0, 0],
        azi_ang=g.azi_ang[0, 0], iray_phase=st.iray > 0,
    )
    return d, np.asarray(spec), wave


def test_convolved_spectrum(setup):
    d, spec, wave = setup
    nconv = int(d["NCONV"][0])
    vconv = d["VCONV"][:nconv, 0]
    got = np.asarray(conv_channel_interp(wave, spec[:, 0], vconv))
    want = d["SPECONV"][:nconv, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
