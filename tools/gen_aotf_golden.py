"""Golden for the AOTF multi-diffraction-order solar-occultation mode.

Attaches synthetic AOTF arrays (3 diffraction orders with shifted channel
grids + per-channel order transmissions) to the Mars CO SO deck's
Measurement and runs the reference nemesisSOfm AOTF branch
(ForwardModel_0.py:825-907: per-order read_tables/CIRSrad/conv, TRANS_AOTF
weighting, normalisation by the summed weights).

Run: python tools/gen_aotf_golden.py   (after gen_so_fixture.py)
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

FIXTURES = os.path.join(REPO, "tests", "fixtures")
GOLDENS = os.path.join(REPO, "tests", "goldens")

SHIFTS = [-2.5, 0.0, 2.6]  # cm-1 order offsets (stay inside the .lta range)


def aotf_trans(nconv, ngeom, norders):
    """Smooth synthetic per-channel order transmissions (sinc^2-like)."""
    x = np.linspace(-1.2, 1.2, nconv)
    trans = np.zeros((nconv, ngeom, norders))
    for o in range(norders):
        t = np.sinc(x - 0.35 * (o - 1)) ** 2 * (0.6 + 0.2 * o) + 0.05
        trans[:, :, o] = t[:, None]
    return trans


def main():
    deck_dir = os.path.join(FIXTURES, "mars_so")
    cwd = os.getcwd()
    os.chdir(deck_dir)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval, Telluric) = (
            ans.Files.read_input_files_hdf5("mars_solocc")
        )
        # Neutralise the .apr scaling models: the reference's AOTF loop
        # re-applies subprofretg to the SAME AtmosphereX on every order
        # iteration (only SpectroscopyX is reset, ForwardModel_0.py:835),
        # so non-unit in-place scalings (model_2.py:133 `*=`) compound
        # across orders — a mutable-state artifact, not physics. With unit
        # factors the golden isolates the AOTF combination semantics.
        Variables.XN[:2] = 1.0
        Variables.XA[:2] = 1.0

        nconv = int(Measurement.NCONV.max())
        ngeom = int(Measurement.NGEOM)
        norders = len(SHIFTS)

        vconv_aotf = np.zeros((nconv, ngeom, norders))
        for o, s in enumerate(SHIFTS):
            vconv_aotf[:, :, o] = Measurement.VCONV + s
        trans = aotf_trans(nconv, ngeom, norders)

        Measurement.NORDERS_AOTF = norders
        Measurement.VCONV_AOTF = vconv_aotf
        Measurement.TRANS_AOTF = trans

        fm = ans.ForwardModel_0(
            runname="mars_solocc", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisSOfm()

        # per-order calculation wave grids (what read_tables returned inside
        # the AOTF loop) so the TPU side can convolve on identical grids
        from copy import deepcopy
        wave_orders = {}
        for o in range(norders):
            m2 = deepcopy(Measurement)
            m2.edit_VCONV(vconv_aotf[:, :, o])
            m2.build_ils(IGEOM=0)
            wmin, wmax = m2.calc_wave_range(apply_doppler=True, IGEOM=None)
            s2 = deepcopy(Spectroscopy)
            s2.read_tables(wavemin=wmin, wavemax=wmax)
            wave_orders[f"WAVE_O{o}"] = s2.WAVE

        out = os.path.join(GOLDENS, "mars_so_aotf_fm.npz")
        np.savez(
            out,
            **wave_orders,
            SPECONV=SPECONV,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
            TANHE=np.asarray(Measurement.TANHE).ravel(),
            VCONV_AOTF=vconv_aotf,
            TRANS_AOTF=trans,
            FWHM=float(Measurement.FWHM),
            ISHAPE=int(Measurement.ISHAPE),
        )
        print("wrote", out, "SPECONV", SPECONV.shape)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
