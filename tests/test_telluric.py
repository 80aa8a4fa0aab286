"""Telluric transmission vs the reference Telluric_0.calc_transmission
(Telluric_0.py:398) on a synthetic Earth atmosphere with in-memory
k-tables."""

import importlib

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.core.spectra import KTables
from archnemesis_tpu.core.types import Atmosphere
from archnemesis_tpu.rt.telluric import Telluric, apply_telluric, telluric_transmission

NP_ = 25
ALTITUDE = 4207.3
EMISS = 160.0


def _earth_profiles():
    h = np.linspace(0.0, 8.0e4, NP_)
    p = 101325.0 * np.exp(-h / 7.5e3)
    t = 288.0 - 6.5e-3 * np.clip(h, 0, 1.2e4) + 2.0e-4 * np.clip(h - 1.2e4, 0, None)
    vmr = np.stack(
        [1e-2 * np.exp(-h / 2.0e3), np.full(NP_, 4.0e-4)], axis=1
    )  # H2O, CO2
    return h, p, t, vmr


def _ktab(wave, press_grid, temp_grid, ng=10):
    rng = np.random.default_rng(4)
    x, w = np.polynomial.legendre.leggauss(ng)
    g_ord, del_g = 0.5 * (x + 1), 0.5 * w
    band = 0.05 + np.exp(
        -0.5 * ((wave[:, None] - rng.uniform(wave[0], wave[-1], 5)) / 15.0) ** 2
    ).sum(1)
    k = (
        5e-22
        * band[None, :, None, None, None]
        * np.exp(2.0 * (g_ord - 0.6))[None, None, :, None, None]
        * (press_grid / press_grid.max())[None, None, None, :, None] ** 0.1
        * (temp_grid / 250.0)[None, None, None, None, :] ** -0.4
        * np.array([1.0, 0.3])[:, None, None, None, None]
    )
    return g_ord, del_g, k


@pytest.fixture(scope="module")
def case():
    h, p, t, vmr = _earth_profiles()
    wave = np.linspace(2000.0, 2100.0, 120)
    press_grid = np.logspace(-6, 0.1, 12)  # atm
    temp_grid = np.linspace(150.0, 320.0, 8)
    g_ord, del_g, k = _ktab(wave, press_grid, temp_grid)
    return h, p, t, vmr, wave, press_grid, temp_grid, g_ord, del_g, k


@pytest.fixture(scope="module")
def ref_trans(case):
    from tools.refutils import import_reference

    ans = import_reference()
    h, p, t, vmr, wave, press_grid, temp_grid, g_ord, del_g, k = case

    atm = ans.Atmosphere_0()
    atm.NP = NP_
    atm.NVMR = 2
    atm.ID = np.array([1, 2])
    atm.ISO = np.array([0, 0])
    atm.IPLANET = 3
    atm.LATITUDE = 19.8
    atm.edit_H(h)
    atm.edit_P(p)
    atm.edit_T(t)
    atm.edit_VMR(vmr)
    atm.RADIUS = 6.371e6
    atm.PARAH2 = None
    atm.DUST = np.zeros((NP_, 0))

    spec = ans.Spectroscopy_0(RUNNAME="")
    spec.ILBL = ans.enum.SpectralCalculationModeEnum.K_TABLES
    spec.NGAS = 2
    spec.ID = np.array([1, 2])
    spec.ISO = np.array([0, 0])
    spec.NWAVE = wave.size
    spec.WAVE = wave.copy()
    spec.ISPACE = ans.enum.WaveUnitEnum.Wavenumber_cm
    spec.NG = g_ord.size
    spec.G_ORD = g_ord.copy()
    spec.DELG = del_g.copy()
    spec.NP = press_grid.size
    spec.NT = temp_grid.size
    spec.PRESS = press_grid.copy()
    spec.TEMP = temp_grid.copy()
    spec.K = np.transpose(k, (1, 2, 3, 4, 0)).copy()  # (NWAVE,NG,NP,NT,NGAS)
    spec.ON_GRID = True

    tel = ans.Telluric_0(ALTITUDE=ALTITUDE, EMISS_ANG=EMISS)
    tel.Atmosphere = atm
    tel.Spectroscopy = spec
    wave_out, trans = tel.calc_transmission()
    return np.asarray(wave_out), np.asarray(trans)


def test_transmission_matches_reference(case, ref_trans):
    h, p, t, vmr, wave, press_grid, temp_grid, g_ord, del_g, k = case
    wave_ref, trans_ref = ref_trans

    atm = Atmosphere(
        h=h, p=p, t=t, vmr=vmr, dust=np.zeros((NP_, 0)),
        parah2=np.zeros(NP_), molwt=np.full(NP_, 28.96e-3),
        radius=np.asarray(6.371e6), latitude=np.asarray(19.8),
        gas_id=(1, 2), iso_id=(0, 0), planet=3,
    )
    ktab = KTables(
        wave=wave, g_ord=g_ord, del_g=del_g,
        press=press_grid, temp=temp_grid, k=k,
        gas_id=(1, 2), iso_id=(0, 0),
    )
    tel = Telluric(
        atm=atm, ktables=ktab,
        altitude=ALTITUDE, emiss_ang=EMISS,
    )
    wave_out, trans = telluric_transmission(tel)
    np.testing.assert_allclose(np.asarray(wave_out), wave_ref, rtol=1e-12)
    assert float(np.min(trans_ref)) < 0.95  # the band actually absorbs
    np.testing.assert_allclose(
        np.asarray(trans), trans_ref, rtol=0, atol=2e-6
    )

    # application with Doppler shift: planetary grid shifted, telluric not
    spec_in = jnp.ones(wave.size)
    out = apply_telluric(tel, jnp.asarray(wave), spec_in, v_doppler=10.0)
    expect = np.interp(wave * (1.0 - 10.0e3 / 299792458.0),
                       np.asarray(wave_out), np.asarray(trans))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=0, atol=2e-6)


def test_extract_atmosphere_circ_matches_reference_profile():
    """Bundled CIRC case-1 Earth profile loads with the expected gases
    (reference Telluric_0.extract_atmosphere_circ:378)."""
    import numpy as np

    from archnemesis_tpu.rt.telluric import extract_atmosphere_circ

    atm = extract_atmosphere_circ()
    assert atm.gas_id == (1, 2, 3, 4, 5, 6, 7, 22)
    assert atm.h.shape[0] == 54
    assert np.all(np.diff(np.asarray(atm.h)) > 0)
    # CO2 VMR ~ 360-400 ppm at the surface in CIRC case 1
    ico2 = atm.gas_id.index(2)
    assert 2e-4 < float(np.asarray(atm.vmr)[0, ico2]) < 6e-4


def test_extract_atmosphere_era5_gated_offline():
    import pytest as _pytest

    from archnemesis_tpu.rt.telluric import extract_atmosphere_era5

    with _pytest.raises(NotImplementedError, match="cdsapi"):
        extract_atmosphere_era5()


def test_era5_request_construction():
    """Pure CDS request builder (reference extract_atmosphere_era5:
    Telluric_0.py:211-291): grid-cell bracketing, hour rounding, level
    grid — no cdsapi needed."""
    from archnemesis_tpu.rt.telluric import ERA5_PRESS_LEVELS_HPA, era5_request

    dataset, req, press = era5_request(
        "01-01-2020", "10:47:13", 19.82067, -155.46806
    )
    assert dataset == "reanalysis-era5-pressure-levels"
    # minute>=30 rounds up to the next hour
    assert req["time"] == "11:00" and req["day"] == "01"
    assert len(req["pressure_level"]) == ERA5_PRESS_LEVELS_HPA.size
    # the 0.25-deg cell brackets the location
    lat0, lon0, lat1, lon1 = req["area"]
    assert lat0 <= 19.82067 <= lat1
    assert lon0 <= -155.46806 <= lon1
    assert abs(lat1 - lat0 - 0.25) < 1e-12
    # profile ordering is max->min pressure in Pa
    assert press[0] == 100000.0 and press[-1] == 100.0

    _, req2, _ = era5_request("31-12-2020", "23:45:00", 0.0, 0.0)
    assert req2["year"] == "2021" and req2["day"] == "01"


def test_era5_profiles_to_atmosphere():
    """Profile assembly (reference :297-375): q -> H2O VMR, O3 MMR -> VMR,
    CIRC fill species, hydrostatic altitudes — no network needed."""
    from archnemesis_tpu.rt.telluric import (
        era5_profiles_to_atmosphere,
        grib_interp_location,
    )

    _, _, press = __import__(
        "archnemesis_tpu.rt.telluric", fromlist=["era5_request"]
    ).era5_request("01-01-2020", "00:00:00", 19.8, -155.5)
    n = press.size
    temp = 290.0 - 70.0 * np.linspace(0, 1, n)
    q = 1.0e-2 * np.exp(-np.linspace(0, 6, n))
    o3 = 1.0e-6 * np.exp(-((np.linspace(0, 1, n) - 0.8) / 0.2) ** 2)
    atm = era5_profiles_to_atmosphere(press, temp, q, o3, 19.8, -155.5)
    assert atm.planet == 3 and atm.gas_id[0] == 1
    assert atm.vmr.shape == (n, 8)
    np.testing.assert_allclose(
        np.asarray(atm.vmr)[:, 0], q / (1 - q), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(atm.vmr)[:, 2], o3 / 0.048 * 0.0289644, rtol=1e-12
    )
    # CIRC-filled CO2 is ~400 ppm-ish and constant-ish in the troposphere
    co2 = np.asarray(atm.vmr)[:, 1]
    assert 2e-4 < co2[0] < 6e-4
    # altitudes increase monotonically from ~0
    h = np.asarray(atm.h)
    assert h[0] == 0.0 and np.all(np.diff(h) > 0) and h[-1] > 3.5e4

    # grib bilinear interp: constant field stays constant
    lats = np.array([[19.75, 19.75], [20.0, 20.0]])
    lons = np.array([[-155.75, -155.5], [-155.75, -155.5]])
    f = np.full((2, 2, 3), 7.0)
    np.testing.assert_allclose(
        grib_interp_location(f, lats, lons, 19.8, -155.6), 7.0
    )
