"""Legacy -> HDF5 run-format conversion consistency (the analog of the
reference tests/test_input_file_format_consistency.py:23-80): a legacy deck
written with write_deck_hdf5 and re-loaded with load_deck_hdf5 must hold the
same component data.
"""

import numpy as np
import pytest

from archnemesis_tpu.io.hdf5 import load_deck_hdf5, write_deck_hdf5
from archnemesis_tpu.io.legacy import load_deck

DECK = "tests/fixtures/jupiter_nadir"


@pytest.fixture(scope="module")
def decks(tmp_path_factory):
    d0 = load_deck(DECK, "cirstest")
    p = str(tmp_path_factory.mktemp("h5rt") / "cirstest.h5")
    write_deck_hdf5(p, d0)
    d1 = load_deck_hdf5(p)
    return d0, d1


def test_atmosphere_roundtrip(decks):
    d0, d1 = decks
    for k in ("h", "p", "t", "vmr", "dust", "molwt"):
        np.testing.assert_allclose(
            np.asarray(getattr(d1.atmosphere, k)),
            np.asarray(getattr(d0.atmosphere, k)), rtol=1e-12, err_msg=k)
    assert d1.atmosphere.gas_id == d0.atmosphere.gas_id
    assert d1.atmosphere.iso_id == d0.atmosphere.iso_id
    assert d1.atmosphere.planet == d0.atmosphere.planet


def test_layer_and_settings_roundtrip(decks):
    d0, d1 = decks
    for k in ("nlay", "laytyp", "layint", "layht"):
        assert getattr(d1.layer_config, k) == getattr(d0.layer_config, k), k
    for k in ("ispace", "iscat", "ilbl", "iform", "iray", "imie", "nmu",
              "nf", "nphi", "v_doppler", "niter"):
        assert getattr(d1.settings, k) == getattr(d0.settings, k), k
    assert d1.settings.philimit == pytest.approx(d0.settings.philimit)


def test_measurement_roundtrip(decks):
    d0, d1 = decks
    g0, g1 = d0.geometry, d1.geometry
    assert g1.ngeom == g0.ngeom and g1.fwhm == g0.fwhm
    for k in ("nconv", "nav", "vconv", "meas", "errmeas", "flat", "flon",
              "sol_ang", "emiss_ang", "azi_ang", "wgeom"):
        np.testing.assert_allclose(
            np.asarray(getattr(g1, k)), np.asarray(getattr(g0, k)),
            rtol=1e-12, err_msg=k)


def test_tables_and_cia_roundtrip(decks):
    d0, d1 = decks
    np.testing.assert_allclose(np.asarray(d1.ktables.wave),
                               np.asarray(d0.ktables.wave))
    np.testing.assert_allclose(np.asarray(d1.ktables.k),
                               np.asarray(d0.ktables.k))
    assert d1.cia is not None
    np.testing.assert_allclose(np.asarray(d1.cia.k_cia),
                               np.asarray(d0.cia.k_cia))


def test_surface_roundtrip(decks):
    d0, d1 = decks
    assert d1.surface.gasgiant == d0.surface.gasgiant
    np.testing.assert_allclose(np.asarray(d1.surface.vem),
                               np.asarray(d0.surface.vem))
    np.testing.assert_allclose(np.asarray(d1.surface.emissivity),
                               np.asarray(d0.surface.emissivity))
