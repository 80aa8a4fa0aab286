"""End-to-end nadir thermal-emission forward model vs the reference oracle.

The golden (tests/goldens/jupiter_nadir_fm.npz) is the reference
implementation run on the Jupiter CIRS deck with synthetic k-tables
(tools/gen_fixtures.py). Parity target rtol 1e-5 in float64 on:
per-layer optical depths (gas/CIA/Rayleigh/dust/total) and the convolved
spectrum.
"""

import numpy as np
import pytest

from archnemesis_tpu.core.spectra import AerosolOptics, KTables, SurfaceSpec
from archnemesis_tpu.core.types import Atmosphere, LayerConfig
from archnemesis_tpu.enums import ParaH2Ratio, RayleighScatteringMode, WaveUnit
from archnemesis_tpu.forward import forward_nadir, make_forward_config
from archnemesis_tpu.io.cia import read_cia_tab
from archnemesis_tpu.io.ktables import read_kls
from archnemesis_tpu.ops.convolution import conv_channel_interp

LAYER_GOLDEN = "tests/goldens/jupiter_layering.npz"
FM_GOLDEN = "tests/goldens/jupiter_nadir_fm.npz"
DECK = "tests/fixtures/jupiter_nadir"
CIA_TAB = "archnemesis_tpu/data/reference_data/cia/isotest.tab"


@pytest.fixture(scope="module")
def setup():
    dl = np.load(LAYER_GOLDEN)
    dfm = np.load(FM_GOLDEN)

    atm = Atmosphere(
        h=dl["H"], p=dl["P"], t=dl["T"], vmr=dl["VMR"], dust=dl["DUST"],
        parah2=dl["PARAH2"], molwt=dl["MOLWT"], radius=dl["RADIUS"],
        latitude=dl["LATITUDE"],
        gas_id=tuple(int(x) for x in dl["ID"]),
        iso_id=tuple(int(x) for x in dl["ISO"]),
        planet=int(dl["PLANET"]),
        dust_units_flag=tuple(int(x) for x in dl["DUST_UNITS_FLAG"]) or None,
    )
    laycfg = LayerConfig(
        nlay=int(dl["NLAY"]), laytyp=int(dl["LAYTYP"]), layint=int(dl["LAYINT"]),
        layht=max(float(dl["LAYHT"]), float(dl["H"][0])),
    )

    wave = dfm["WAVE"]
    tables = read_kls(
        f"{DECK}/cirstest.kls", wavemin=wave.min(), wavemax=wave.max()
    )
    ktab = KTables.from_tables(tables)
    np.testing.assert_allclose(np.asarray(ktab.wave), wave, rtol=0, atol=2e-4)

    cia = read_cia_tab(CIA_TAB, dnu=1.0, npara=0, inormal=ParaH2Ratio.NORMAL)

    # deck .xsc: 6 wave points, all-zero extinction
    xsc_wave = np.array([0.0, 700.0, 750.0, 900.0, 950.0, 2000.0])
    aero = AerosolOptics(
        wave=xsc_wave, kext=np.zeros((6, 1)), ksca=np.zeros((6, 1))
    )
    surf = SurfaceSpec(
        tsurf=np.asarray(0.0), vem=np.array([0.0, 1e5]),
        emissivity=np.zeros(2), galb=np.asarray(0.0), gasgiant=True,
    )

    cfg = make_forward_config(
        atm, ktab, cia,
        iray=RayleighScatteringMode.GAS_GIANT_ATM,
        ispace=WaveUnit.Wavenumber_cm,
        gasgiant=True,
    )
    spec, diag = forward_nadir(
        atm, laycfg, ktab, cia, aero, surf, cfg,
        emiss_ang=0.0, sol_ang=180.0, return_diagnostics=True,
    )
    return dict(
        dfm=dfm, spec=np.asarray(spec), diag=diag, wave=wave,
    )


@pytest.mark.parametrize(
    "name,key",
    [
        ("taugas", "TAUGAS"),
        ("taucia", "TAUCIA"),
        ("tauray", "TAURAY"),
        ("taudust", "TAUDUST"),
        ("tautot", "TAUTOT"),
    ],
)
def test_layer_taus(setup, name, key):
    got = np.asarray(setup["diag"][name])
    want = setup["dfm"][key]
    atol = 1e-14 * max(np.abs(want).max(), 1e-30)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol, err_msg=name)


def test_convolved_spectrum(setup):
    dfm = setup["dfm"]
    vconv = dfm["VCONV"][: int(dfm["NCONV"][0]), 0]
    got = np.asarray(
        conv_channel_interp(setup["wave"], setup["spec"][:, 0], vconv)
    )
    want = dfm["SPECONV"][: int(dfm["NCONV"][0]), 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0)
