"""Stellar subsystem: .sol / stellar-file / HDF5 round-trips, flux and
blackbody luminosity (reference Stellar_0)."""

import numpy as np
import pytest

from archnemesis_tpu.io import stellar as st


@pytest.fixture
def spec():
    wave = np.linspace(500.0, 3000.0, 40)
    solspec = 1e18 * np.exp(-((wave - 1800.0) / 900.0) ** 2)
    return st.StellarSpec(
        wave=wave, solspec=solspec, dist=np.asarray(5.2),
        radius=np.asarray(695700.0), solexist=True, ispace=0,
    )


def test_sol_inline_roundtrip(tmp_path, spec):
    p = str(tmp_path / "run.sol")
    st.write_sol(p, spec)
    back = st.read_sol(p, dist=5.2)
    np.testing.assert_allclose(back.wave, spec.wave, rtol=1e-8)
    np.testing.assert_allclose(back.solspec, spec.solspec, rtol=1e-8)
    assert float(back.radius) == pytest.approx(695700.0)
    assert back.ispace == 0 and back.solexist


def test_sol_named_file(tmp_path, spec):
    ddir = tmp_path / "stellar"
    ddir.mkdir()
    st.write_solar_file(
        str(ddir / "sun.dat"), spec, header="synthetic sun\nfor tests"
    )
    sol = tmp_path / "run.sol"
    sol.write_text("sun.dat\n")
    back = st.read_sol(str(sol), dist=1.0, stellar_data_dir=str(ddir))
    np.testing.assert_allclose(back.solspec, spec.solspec, rtol=1e-8)
    assert float(back.dist) == 1.0


def test_hdf5_roundtrip(tmp_path, spec):
    h5 = str(tmp_path / "run.h5")
    st.write_stellar_hdf5(h5, spec)
    back = st.read_stellar_hdf5(h5)
    np.testing.assert_allclose(back.wave, spec.wave)
    np.testing.assert_allclose(back.solspec, spec.solspec)
    assert float(back.dist) == pytest.approx(5.2)


def test_hdf5_absent_group(tmp_path):
    import h5py

    h5 = str(tmp_path / "empty.h5")
    with h5py.File(h5, "w"):
        pass
    assert st.read_stellar_hdf5(h5) is None


def test_flux_power_inverse(spec):
    flux = st.calc_solar_flux(spec)
    np.testing.assert_allclose(
        st.calc_solar_power(flux, spec.dist), spec.solspec, rtol=1e-12
    )
    # flux at 5.2 AU is area-diluted: 4 pi (5.2 AU in cm)^2
    area = 4.0 * np.pi * (5.2 * st.AU_CM) ** 2
    np.testing.assert_allclose(flux * area, spec.solspec, rtol=1e-12)


def test_luminosity_blackbody_shape_and_scale(spec):
    out = st.luminosity_blackbody(spec, 5800.0)
    lum = np.asarray(out.solspec)
    assert lum.shape == spec.wave.shape
    assert (lum > 0).all()
    # hotter star emits more everywhere
    hotter = np.asarray(st.luminosity_blackbody(spec, 7000.0).solspec)
    assert (hotter > lum).all()


def test_forward_solar_flux_consistency(spec):
    """forward.solar_flux (device path) must equal the host-side
    calc_solar_flux on the native grid."""
    import jax

    from archnemesis_tpu.forward import solar_flux

    got = np.asarray(solar_flux(spec, jax.numpy.asarray(spec.wave)))
    np.testing.assert_allclose(got, st.calc_solar_flux(spec), rtol=1e-10)
