"""BRDF surfaces end-to-end in the RT deck drivers vs the reference.

Golden (tests/goldens/jupiter_brdf_fm.npz, tools/gen_brdf_golden.py): the
reference nemesisfm on the Jupiter angled scattering deck with a synthetic
surface patched in — multiple scattering with Lambert (LOWBC=1) and Hapke
(LOWBC=2) lower boundaries (reference calc_brdf_matrix ForwardModel_0.py:
5168 feeding scloud11wave), and plane-parallel single scattering with
Hapke and Oren–Nayar surfaces (Surface_0.calc_BRDF:916).
"""

import os

import numpy as np
import pytest

from archnemesis_tpu.core.spectra import HapkeParams
from archnemesis_tpu.enums import LowerBoundaryCondition
from archnemesis_tpu.forward import (
    forward_scattering_nadir,
    forward_singlescat_nadir,
    make_forward_config,
)
from archnemesis_tpu.io.legacy import load_deck
from archnemesis_tpu.ops.convolution import conv_channel_interp
from archnemesis_tpu.rt.scattering import ScatterQuadrature

DECK = "tests/fixtures/jupiter_scatter"
GOLDEN = "tests/goldens/jupiter_brdf_fm.npz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="jupiter_brdf_fm golden not generated"
)


def _patched_surface(d, lowbc):
    vem = d["VEM"]
    hapke = None
    on_albedo = on_roughness = None
    if lowbc == 2:
        hapke = HapkeParams(
            vem=vem,
            sglalb=np.full(2, d["HAPKE_SGLALB"]),
            k=np.full(2, d["HAPKE_K"]),
            bs0=np.full(2, d["HAPKE_BS0"]),
            hs=np.full(2, d["HAPKE_hs"]),
            bc0=np.full(2, d["HAPKE_BC0"]),
            hc=np.full(2, d["HAPKE_hc"]),
            roughness=np.full(2, d["HAPKE_ROUGHNESS"]),
            g1=np.full(2, d["HAPKE_G1"]),
            g2=np.full(2, d["HAPKE_G2"]),
            f=np.full(2, d["HAPKE_F"]),
        )
    if lowbc == 3:
        on_albedo = np.full(2, d["ON_ALB"])
        on_roughness = np.full(2, d["ON_ROUGH"])
    return dict(
        tsurf=np.asarray(float(d["TSURF"])),
        vem=vem,
        emissivity=np.full(2, float(d["EMISS"])),
        galb=np.asarray(float(d["GALB"])),
        hapke=hapke,
        on_albedo=on_albedo,
        on_roughness=on_roughness,
        lowbc=LowerBoundaryCondition(lowbc),
        gasgiant=False,
    )


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    deck = load_deck(DECK, "cirstest")
    wave = d["WAVE"]
    kt = deck.ktables
    sel = np.where(
        (np.asarray(kt.wave) >= wave.min())
        & (np.asarray(kt.wave) <= wave.max())
    )[0]
    ktw = kt.replace(wave=np.asarray(kt.wave)[sel], k=np.asarray(kt.k)[:, sel])
    np.testing.assert_allclose(np.asarray(ktw.wave), wave, rtol=0, atol=2e-4)
    return d, deck, ktw, wave


def _run(setup_t, lowbc, single):
    d, deck, ktw, wave = setup_t
    st = deck.settings
    surf = deck.surface.replace(**_patched_surface(d, lowbc))
    cfg = make_forward_config(
        deck.atmosphere, ktw, deck.cia, iray=st.iray, ispace=st.ispace,
        gasgiant=False,
    )
    g = deck.geometry
    common = dict(
        emiss_ang=g.emiss_ang[0, 0], sol_ang=g.sol_ang[0, 0],
        azi_ang=g.azi_ang[0, 0], iray_phase=st.iray > 0,
    )
    if single:
        spec = forward_singlescat_nadir(
            deck.atmosphere, deck.layer_config, ktw, deck.cia, deck.aerosol,
            surf, deck.stellar, cfg, deck.hgphase, **common,
        )
    else:
        quad = ScatterQuadrature(
            mu=st.mu, wtmu=st.wtmu, nf=st.nf, nphi=st.nphi
        )
        spec = forward_scattering_nadir(
            deck.atmosphere, deck.layer_config, ktw, deck.cia, deck.aerosol,
            surf, deck.stellar, cfg, quad, deck.hgphase, **common,
        )
    nconv = int(d["NCONV"][0])
    vconv = d["VCONV"][:nconv, 0]
    return np.asarray(
        conv_channel_interp(wave, np.asarray(spec)[:, 0], vconv)
    ), nconv


@pytest.mark.parametrize(
    "key,lowbc,single",
    [
        ("ms_lambert", 1, False),
        ("ms_hapke", 2, False),
        ("ss_hapke", 2, True),
        ("ss_orennayar", 3, True),
    ],
)
def test_brdf_forward_matches_reference(setup, key, lowbc, single):
    d = setup[0]
    got, nconv = _run(setup, lowbc, single)
    want = d[key][:nconv, 0]
    np.testing.assert_allclose(
        got, want, rtol=1e-5, atol=np.abs(want).max() * 1e-8
    )
