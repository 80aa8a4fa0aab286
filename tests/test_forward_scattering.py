"""End-to-end nadir multiple-scattering forward model vs the reference.

Golden (tests/goldens/jupiter_scatter_fm.npz, tools/gen_scatter_fixture.py):
the reference nemesisfm on the Jupiter angled scattering deck (sol=10,
emi=10, azi=0; NF=0, NMU=5, HG aerosol + Rayleigh, solar on) truncated to
60 channels, run with the synthetic fixture k-tables.
"""

import numpy as np
import pytest

from archnemesis_tpu.forward import forward_scattering_nadir, make_forward_config
from archnemesis_tpu.io.legacy import load_deck
from archnemesis_tpu.ops.convolution import conv_channel_interp
from archnemesis_tpu.rt.scattering import ScatterQuadrature

DECK = "tests/fixtures/jupiter_scatter"
GOLDEN = "tests/goldens/jupiter_scatter_fm.npz"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    deck = load_deck(DECK, "cirstest")
    st = deck.settings
    # golden is generated with subprofretg skipped (raw deck profiles); the
    # deck's .apr models (47 cloud, 444 Mie) are exercised separately

    wave = d["WAVE"]
    kt = deck.ktables
    sel = np.where(
        (np.asarray(kt.wave) >= wave.min()) & (np.asarray(kt.wave) <= wave.max())
    )[0]
    ktw = kt.replace(wave=np.asarray(kt.wave)[sel], k=np.asarray(kt.k)[:, sel])
    np.testing.assert_allclose(np.asarray(ktw.wave), wave, rtol=0, atol=2e-4)

    cfg = make_forward_config(
        deck.atmosphere, ktw, deck.cia, iray=st.iray, ispace=st.ispace,
        gasgiant=deck.surface.gasgiant,
    )
    quad = ScatterQuadrature(
        mu=st.mu, wtmu=st.wtmu, nf=st.nf, nphi=st.nphi
    )
    g = deck.geometry
    spec, diag = forward_scattering_nadir(
        deck.atmosphere, deck.layer_config, ktw, deck.cia, deck.aerosol,
        deck.surface, deck.stellar, cfg, quad, deck.hgphase,
        emiss_ang=g.emiss_ang[0, 0], sol_ang=g.sol_ang[0, 0],
        azi_ang=g.azi_ang[0, 0], iray_phase=st.iray > 0,
        return_diagnostics=True,
    )
    return d, deck, np.asarray(spec), diag, wave


@pytest.mark.parametrize(
    "name,key",
    [
        ("taugas", "TAUGAS"),
        ("taucia", "TAUCIA"),
        ("tauray", "TAURAY"),
        ("taudust", "TAUDUST"),
        ("tauscat", "TAUSCAT"),
        ("tautot", "TAUTOT"),
    ],
)
def test_layer_taus(setup, name, key):
    d, _, _, diag, _ = setup
    got = np.asarray(diag[name])
    want = d[key]
    atol = 1e-12 * max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol, err_msg=name)


def test_convolved_spectrum(setup):
    d, deck, spec, _, wave = setup
    nconv = int(d["NCONV"][0])
    vconv = d["VCONV"][:nconv, 0]
    got = np.asarray(conv_channel_interp(wave, spec[:, 0], vconv))
    want = d["SPECONV"][:nconv, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
