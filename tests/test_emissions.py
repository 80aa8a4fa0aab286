"""Non-LTE atmospheric emissions vs the reference oracle.

Golden: tests/goldens/jupiter_emissions_fm.npz — the reference forward model
on the Jupiter CIRS nadir deck with two synthetic emission tables attached
(NH3 fluorescence + C2H2 chemical; tools/gen_emissions_golden.py). Parity
target rtol 1e-5 on the convolved spectrum, which carries an ~8% emission
contribution.
"""

import glob

import numpy as np
import pytest

from archnemesis_tpu.core.spectra import AerosolOptics, KTables, SurfaceSpec
from archnemesis_tpu.core.types import Atmosphere, LayerConfig
from archnemesis_tpu.enums import (
    EmissionType,
    ParaH2Ratio,
    RayleighScatteringMode,
    WaveUnit,
)
from archnemesis_tpu.forward import forward_nadir, make_forward_config
from archnemesis_tpu.io.cia import read_cia_tab
from archnemesis_tpu.io.emissions import read_emission_tables
from archnemesis_tpu.io.ktables import read_kls
from archnemesis_tpu.ops.convolution import conv_channel_interp
from archnemesis_tpu.ops.emissions import locate_emission_gases

LAYER_GOLDEN = "tests/goldens/jupiter_layering.npz"
EM_GOLDEN = "tests/goldens/jupiter_emissions_fm.npz"
DECK = "tests/fixtures/jupiter_nadir"
EMISS_DIR = "tests/fixtures/jupiter_emiss"
CIA_TAB = "archnemesis_tpu/data/reference_data/cia/isotest.tab"


@pytest.fixture(scope="module")
def setup():
    dl = np.load(LAYER_GOLDEN)
    dfm = np.load(EM_GOLDEN)

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
        nlay=int(dl["NLAY"]), laytyp=int(dl["LAYTYP"]),
        layint=int(dl["LAYINT"]),
        layht=max(float(dl["LAYHT"]), float(dl["H"][0])),
    )

    wave = dfm["WAVE"]
    tables = read_kls(
        f"{DECK}/cirstest.kls", wavemin=wave.min(), wavemax=wave.max()
    )
    ktab = KTables.from_tables(tables)
    cia = read_cia_tab(CIA_TAB, dnu=1.0, npara=0, inormal=ParaH2Ratio.NORMAL)

    xsc_wave = np.array([0.0, 700.0, 750.0, 900.0, 950.0, 2000.0])
    aero = AerosolOptics(
        wave=xsc_wave, kext=np.zeros((6, 1)), ksca=np.zeros((6, 1))
    )
    surf = SurfaceSpec(
        tsurf=np.asarray(0.0), vem=np.array([0.0, 1e5]),
        emissivity=np.zeros(2), galb=np.asarray(0.0), gasgiant=True,
    )

    emis = read_emission_tables(sorted(glob.glob(f"{EMISS_DIR}/*.h5")))
    cols = locate_emission_gases(emis, atm.gas_id, atm.iso_id)

    cfg = make_forward_config(
        atm, ktab, cia,
        iray=RayleighScatteringMode.GAS_GIANT_ATM,
        ispace=WaveUnit.Wavenumber_cm,
        gasgiant=True,
    )
    dist = float(dfm["DIST"]) if bool(dfm["SOLEXIST"]) else None
    spec = forward_nadir(
        atm, laycfg, ktab, cia, aero, surf, cfg,
        emiss_ang=0.0, sol_ang=180.0,
        emis=emis, emis_gas_cols=cols, emis_dist=dist,
    )
    return dict(dfm=dfm, spec=np.asarray(spec), wave=wave, emis=emis)


def test_tables_roundtrip(setup):
    """Reader reproduces the generated tables (format contract)."""
    dfm = setup["dfm"]
    em = setup["emis"]
    # sorted glob order: c2h2_chem, nh3_fluor -> reference order [1, 0]
    order = [1, 0]
    np.testing.assert_allclose(np.asarray(em.wave), dfm["EM_WAVE"])
    np.testing.assert_allclose(np.asarray(em.temp), dfm["EM_TEMP"])
    np.testing.assert_allclose(np.asarray(em.k), dfm["EM_K"][:, :, order])
    assert tuple(int(t) for t in em.emtype) == tuple(
        dfm["EM_EMTYPE"][order]
    )
    assert em.gas_id == tuple(dfm["EM_ID"][0][order])
    np.testing.assert_allclose(
        np.asarray(em.rate_coeff[:, 0]), dfm["EM_RATE_COEFF"][:, 1]
    )
    assert em.emtype[0] == EmissionType.CHEMICAL


def test_emissions_spectrum(setup):
    dfm = setup["dfm"]
    vconv = dfm["VCONV"][: int(dfm["NCONV"][0]), 0]
    got = np.asarray(
        conv_channel_interp(setup["wave"], setup["spec"][:, 0], vconv)
    )
    want = dfm["SPECONV"][: int(dfm["NCONV"][0]), 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0)
