"""Models 444 / 446 / 500 (optics parameterisations) vs the reference
(Models/PreRTModels/model_444.py, model_446.py, model_500.py)."""

import importlib

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.core.spectra import AerosolOptics, CIATables
from archnemesis_tpu.enums import ParaH2Ratio
from archnemesis_tpu.models.base import MODEL_REGISTRY, ModelEntry, ProfileTarget
from archnemesis_tpu.models.optics_models import Model444, Model446, Model500


def _entry(model_id, varident, nx, extra):
    return ModelEntry(
        varident=varident, model_id=model_id, ix=0, nx=nx,
        target=ProfileTarget.NOT_ATMOSPHERIC, extra=extra,
    )


def test_registry_has_optics_models():
    assert 444 in MODEL_REGISTRY
    assert 446 in MODEL_REGISTRY
    assert 500 in MODEL_REGISTRY


def test_model446_lookup_interpolation(tmp_path):
    rng = np.random.default_rng(11)
    wave_lu = np.linspace(800.0, 1400.0, 25)
    reff = np.array([0.1, 0.5, 1.0, 2.0, 5.0])
    kext_lu = rng.uniform(0.5, 2.0, (25, 5)).cumsum(axis=1)
    alb_lu = rng.uniform(0.2, 0.9, (25, 5))

    aero_wave = np.linspace(850.0, 1350.0, 40)
    aero = AerosolOptics(
        wave=aero_wave,
        kext=np.ones((40, 2)),
        ksca=np.ones((40, 2)),
    )
    entry = _entry(446, (446, 1, 446), 1,
                   (1, 1, 1000.0, wave_lu, reff, kext_lu, alb_lu))
    out = Model446.apply_scatter(entry, aero, jnp.asarray([0.73]))

    # independent numpy reimplementation (reference model_446.py:125-150)
    from scipy.interpolate import interp1d

    k1 = interp1d(wave_lu, kext_lu, axis=0)(aero_wave)
    a1 = interp1d(wave_lu, alb_lu, axis=0)(aero_wave)
    kx = interp1d(reff, k1, axis=1)(0.73)
    ax = interp1d(reff, a1, axis=1)(0.73)
    kx = kx / np.interp(1000.0, aero_wave, kx)
    np.testing.assert_allclose(np.asarray(out.kext)[:, 1], kx, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out.ksca)[:, 1], ax * kx, rtol=1e-10)
    # clamping at the table edge
    out2 = Model446.apply_scatter(entry, aero, jnp.asarray([99.0]))
    kx2 = interp1d(reff, k1, axis=1)(5.0)
    kx2 = kx2 / np.interp(1000.0, aero_wave, kx2)
    np.testing.assert_allclose(np.asarray(out2.kext)[:, 1], kx2, rtol=1e-10)


def test_model500_gaussian_basis():
    waven = np.linspace(0.0, 2000.0, 201)
    cia = CIATables(
        waven=waven,
        temp=np.array([100.0, 200.0]),
        frac=np.array([0.25]),
        k_cia=np.full((2, 1, 2, 201), 7.0),
        pair_gas1=(39, 39), pair_gas2=(39, 40),
        inormalt=(None, None), npara=0,
        inormal=ParaH2Ratio.EQUILIBRIUM,
    )
    nbasis = 5
    entry = _entry(500, (500, 1, 500), nbasis, (1,))
    amps = np.array([2.0, 1.0, 3.0, 0.5, 1.5])
    out = Model500.apply_cia(entry, cia, jnp.asarray(amps),
                             wave_range=(400.0, 1600.0))
    k = np.asarray(out.k_cia)
    # untouched pair zeroed (reference zeroes the whole table)
    assert np.all(k[0] == 0.0)
    # reference formula (model_500.py:79-95)
    ilo, ihi = 40, 160
    width = (ihi - ilo) / nbasis
    centers = np.linspace(ilo, ihi, nbasis)
    x = np.arange(ilo, ihi + 1)
    g = np.exp(-((x[:, None] - centers[None, :]) ** 2) / (2 * width**2))
    expect = g @ (amps * 1e-40)
    np.testing.assert_allclose(k[1, 0, 0, ilo : ihi + 1], expect, rtol=1e-12)
    np.testing.assert_allclose(k[1, 0, 1, ilo : ihi + 1], expect, rtol=1e-12)
    assert np.all(k[1, 0, 0, :ilo] == 0.0)
    assert np.all(k[1, 0, 0, ihi + 1 :] == 0.0)


@pytest.fixture(scope="module")
def ref_scatter_mod():
    from tools.refutils import import_reference

    import_reference()
    return importlib.import_module("archnemesis.Scatter_0")


def test_model444_vs_reference(ref_scatter_mod):
    """Full 444 chain (KK -> Mie -> normalise) against the reference
    Model444.calculate on a small wavenumber grid."""
    from archnemesis.Models import Models as RefModels

    wave = np.array([2000.0, 3000.0, 4500.0])  # cm-1
    haze_waves = np.sort(1.0e4 / wave)  # microns, ascending
    xprof = np.array(
        [np.log(0.25), np.log(0.2)] + list(np.log([0.01, 0.02, 0.015]))
    )
    haze_params = dict(
        NX=5, WAVE=list(haze_waves), NREAL=1.4,
        WAVE_REF=float(haze_waves[0]), WAVE_NORM=3000.0,
    )

    sc = ref_scatter_mod.Scatter_0(
        ISPACE=0, NDUST=1, NTHETA=5,
        THETA=np.array([0.0, 45.0, 90.0, 135.0, 180.0]),
    )
    sc.WAVE = wave
    sc.NWAVE = 3
    sc.KEXT = np.zeros((3, 1))
    sc.KSCA = np.zeros((3, 1))
    sc.KABS = np.zeros((3, 1))
    sc.SGLALB = np.zeros((3, 1))
    sc.F = np.zeros((3, 1))
    sc.G1 = np.zeros((3, 1))
    sc.G2 = np.zeros((3, 1))
    sc = RefModels[444].calculate(sc, 0, 1, xprof, haze_params)

    aero = AerosolOptics(
        wave=wave, kext=np.zeros((3, 1)), ksca=np.zeros((3, 1))
    )
    entry = _entry(
        444, (444, 1, 444), 5,
        (0, 1, tuple(haze_waves), float(haze_waves[0]), 1.4, 3000.0),
    )
    out = Model444.apply_scatter(entry, aero, jnp.exp(jnp.asarray(xprof)),
                                 ispace=0)
    np.testing.assert_allclose(
        np.asarray(out.kext)[:, 0], sc.KEXT[:, 0], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.ksca)[:, 0], sc.KSCA[:, 0], rtol=1e-6
    )


def test_model444_from_apr_roundtrip(tmp_path):
    """The .apr/.dat parse produces the documented state layout."""
    import io

    haze = tmp_path / "haze.dat"
    haze.write_text(
        "0.3 0.06\n"
        "0.2 0.04\n"
        "2 50.0   ! nwave, clen\n"
        "2.5 1.42 ! vref, nreal\n"
        "3.3      ! v_od_norm\n"
        "2.5 0.01 0.002\n"
        "5.0 0.02 0.004\n"
    )
    apr_line = io.StringIO(f"{haze}\n")
    res = Model444.from_apr(apr_line, (444, 1, 444), 0, {})
    assert res.entry.nx == 4
    np.testing.assert_allclose(
        res.x0, np.log([0.3, 0.2, 0.01, 0.02]), rtol=1e-12
    )
    assert res.entry.extra[0] == 0  # idust from varident[1]-1
    assert res.entry.extra[2] == (2.5, 5.0)
    assert res.lx.tolist() == [1, 1, 1, 1]
    # correlation applied to the k_im block
    assert res.corr[2, 3] > 0
