"""End-to-end golden for the single-scattering nadir forward model: the
localized Jupiter scattering deck (tools/gen_scatter_fixture.py must have
run) re-run with ISCAT=SINGLE_SCATTERING_PLANE_PARALLEL.

Run: python tools/gen_singlescat_fixture.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

from tools.gen_fixtures import FIXTURES, GOLDENS  # noqa: E402


def main():
    deck = os.path.join(FIXTURES, "jupiter_scatter")
    cwd = os.getcwd()
    os.chdir(deck)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files(
            "cirstest"
        )
        from archnemesis.enum import ScatteringCalculationModeEnum

        Scatter.ISCAT = ScatteringCalculationModeEnum.SINGLE_SCATTERING_PLANE_PARALLEL
        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        fm.subprofretg = lambda: None  # raw deck profiles (as scatter golden)
        SPECONV = fm.nemesisfm()
        out = os.path.join(GOLDENS, "jupiter_singlescat_fm.npz")
        np.savez(
            out,
            SPECONV=SPECONV,
            WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
        )
        print("wrote", out, SPECONV.shape)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
