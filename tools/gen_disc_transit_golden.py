"""Goldens for disc-averaging quadrature and primary-transit forward model.

1. Reference Measurement_0.calc_avepoints_exoplanet quadrature tables for a
   few (nmu, phase) combinations -> tests/goldens/disc_quadrature.npz
2. Reference nemesisPTfm transit-depth spectrum on the mars_so fixture deck
   (first geometry, IFORM=TransitDepth, synthetic stellar radius)
   -> tests/goldens/mars_transit_fm.npz

Run after tools/gen_so_fixture.py (needs tests/fixtures/mars_so).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

GOLDENS = os.path.join(REPO, "tests", "goldens")
DECK = os.path.join(REPO, "tests", "fixtures", "mars_so")

CASES = [(3, 0.0), (5, 0.0), (5, 90.0), (4, 180.0), (5, 247.0)]


def gen_quadrature():
    out = {}
    for i, (nmu, phase) in enumerate(CASES):
        meas = ans.Measurement_0(runname="disc", NGEOM=1, FWHM=0.0)
        meas.NCONV = np.array([2])
        meas.VCONV = np.array([[1000.0], [1001.0]])
        meas.NAV = np.array([1])
        meas.FLAT = np.zeros((1, 1))
        meas.FLON = np.zeros((1, 1))
        meas.WGEOM = np.ones((1, 1))
        meas.EMISS_ANG = np.zeros((1, 1))
        meas.SOL_ANG = np.zeros((1, 1))
        meas.AZI_ANG = np.zeros((1, 1))
        meas.calc_avepoints_exoplanet(nmu=nmu, phase=phase, igeom=0)
        nav = int(meas.NAV[0])
        out[f"case{i}_nmu"] = nmu
        out[f"case{i}_phase"] = phase
        out[f"case{i}_flat"] = meas.FLAT[0, :nav]
        out[f"case{i}_flon"] = meas.FLON[0, :nav]
        out[f"case{i}_sol"] = meas.SOL_ANG[0, :nav]
        out[f"case{i}_emiss"] = meas.EMISS_ANG[0, :nav]
        out[f"case{i}_azi"] = meas.AZI_ANG[0, :nav]
        out[f"case{i}_wgeom"] = meas.WGEOM[0, :nav]
    path = os.path.join(GOLDENS, "disc_quadrature.npz")
    np.savez(path, ncases=len(CASES), **out)
    print("wrote", path)


def gen_transit():
    cwd = os.getcwd()
    os.chdir(DECK)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval,
         Telluric) = ans.Files.read_input_files_hdf5("mars_solocc")
        from archnemesis.enum import SpectraUnitEnum

        # single transit geometry on the first geometry's channels
        nconv = int(Measurement.NCONV[0])
        Measurement.NGEOM = 1
        Measurement.NCONV = np.array([nconv])
        Measurement.VCONV = Measurement.VCONV[:nconv, 0:1].copy()
        Measurement.MEAS = Measurement.MEAS[:nconv, 0:1].copy()
        Measurement.ERRMEAS = Measurement.ERRMEAS[:nconv, 0:1].copy()
        Measurement.IFORM = SpectraUnitEnum.TransitDepth
        Measurement.calc_geometry_primary_transit()
        Stellar.RADIUS = 696000.0  # km

        fm = ans.ForwardModel_0(
            runname="mars_solocc", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisPTfm()
        # re-derive the pre-convolution pieces for diagnostics
        SPECOUT = fm.CIRSrad()
        out = os.path.join(GOLDENS, "mars_transit_fm.npz")
        np.savez(
            out, SPECONV=SPECONV, WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV[:, 0], NCONV=nconv,
            STELLAR_RADIUS_KM=696000.0, BASEH=fm.LayerX.BASEH,
            XA=Variables.XA[: Variables.NX],
            SPECOUT=SPECOUT, RADIUS=fm.AtmosphereX.RADIUS,
            NPATH=fm.PathX.NPATH,
        )
        print("wrote", out, "SPECONV", np.asarray(SPECONV).shape)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    gen_quadrature()
    gen_transit()
