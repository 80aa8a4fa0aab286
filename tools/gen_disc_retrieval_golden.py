"""Golden for the disc-averaged forward model on the Jupiter nadir deck:
the reference nemesisdiscfm (ForwardModel_0.py:1609) with the exoplanet
disc quadrature (Measurement_0.calc_avepoints_exoplanet:1680) at nmu=3,
phase=0 — the exact configuration of tests/test_retrieval_disc.py.

Output: tests/goldens/jupiter_disc_fm.npz (SPECONV on the deck's VCONV
channels). Slow: pure-Python oracle via the numba stub.
"""

import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

DECK = os.path.join(REPO, "tests", "fixtures", "jupiter_nadir")
KTAB = os.path.join(REPO, "tests", "fixtures", "ktables")
OUT = os.path.join(REPO, "tests", "goldens", "jupiter_disc_fm.npz")

NMU = 3
PHASE = 0.0


def main():
    tmp = tempfile.mkdtemp(prefix="refdisc_")
    dst = os.path.join(tmp, "deck")
    shutil.copytree(DECK, dst)
    shutil.copytree(KTAB, os.path.join(tmp, "ktables"))
    cwd = os.getcwd()
    os.chdir(dst)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files("cirstest")
        Measurement.calc_avepoints_exoplanet(nmu=NMU, phase=PHASE, igeom=0)
        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisdiscfm()
        nconv = int(Measurement.NCONV[0])
        np.savez(
            OUT,
            nmu=NMU, phase=PHASE,
            SPECONV=np.asarray(SPECONV)[:nconv, 0],
            VCONV=Measurement.VCONV[:nconv, 0],
            NAV=int(Measurement.NAV[0]),
            WGEOM=Measurement.WGEOM[0, : int(Measurement.NAV[0])],
            EMISS_ANG=Measurement.EMISS_ANG[0, : int(Measurement.NAV[0])],
        )
        print("wrote", OUT, "nconv", nconv)
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
