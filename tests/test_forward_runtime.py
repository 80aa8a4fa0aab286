"""Runtime line-by-line (ILBL=1) nadir forward model vs the reference.

Golden (tests/goldens/co_runtime_fm.npz, tools/gen_runtime_fixture.py):
the reference nemesisfm with on-the-fly Voigt synthesis on a synthetic
Mars-like CO deck (CO 2-0 band, 1600 calc waves, 10 layers). Covers the
RUNTIME .lls config parsing, per-gas ambient-fraction computation from
layer-mean VMRs, and the blocked LBL kernel inside the full RT chain.
"""

import numpy as np
import pytest

from archnemesis_tpu.forward import forward_nadir, make_forward_config
from archnemesis_tpu.io.legacy import load_deck
from archnemesis_tpu.ops.convolution import conv_channel_interp
from archnemesis_tpu.retrieval.statevector import apply_state, read_apr

DECK = "tests/fixtures/co_runtime"
GOLDEN = "tests/goldens/co_runtime_fm.npz"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    deck = load_deck(DECK, "cirstest")
    st = deck.settings

    # the oracle ran subprofretg (hydrostatic H rebalance at the a-priori)
    sv = read_apr(f"{DECK}/cirstest.apr", deck.atmosphere)
    deck.atmosphere = apply_state(deck.atmosphere, sv.xa, sv)

    wave = d["WAVE"]
    np.testing.assert_allclose(deck.ktables.wave, wave, rtol=0, atol=1e-8)
    # reference restricts fetched lines to the per-geometry ILS range
    # (Spectroscopy_0.py:1468-1485); FWHM=0 -> the channel range
    nconv = int(deck.geometry.nconv[0])
    vconv = deck.geometry.vconv[:nconv, 0]
    rt = deck.ktables.windowed(vconv.min(), vconv.max())

    cfg = make_forward_config(
        deck.atmosphere, rt, None, iray=st.iray, ispace=st.ispace,
        gasgiant=True,
    )
    spec, diag = forward_nadir(
        deck.atmosphere, deck.layer_config, rt, None, None, deck.surface,
        cfg, emiss_ang=0.0, return_diagnostics=True,
    )
    return d, np.asarray(spec), diag, wave


def test_layer_taugas(setup):
    d, _, diag, _ = setup
    want = d["TAUGAS"]
    got = np.asarray(diag["taugas"])
    atol = 1e-10 * np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=atol)


def test_convolved_spectrum(setup):
    d, spec, _, wave = setup
    nconv = int(d["NCONV"][0])
    vconv = d["VCONV"][:nconv, 0]
    got = np.asarray(conv_channel_interp(wave, spec[:, 0], vconv))
    want = d["SPECONV"][:nconv, 0]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
