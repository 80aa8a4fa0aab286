"""Golden for the FULL OE retrieval on the reduced Jupiter deck
(tests/fixtures/jupiter_fdret, tools/gen_fdret_fixture.py): the reference
coreretOE trajectory (XN per iteration, PHI/CHISQ sequence, final fitted
spectrum), mirroring the reference's own end-to-end retrieval test
(tests/test_zzz_retrieval.py:122-212 asserts the output spectrum at
rtol 5e-2, atol median*1e-2).

Run: python tools/gen_retrieval_golden.py  (VERY slow: pure-Python oracle,
runs in a /tmp copy of the deck so the fixture dir stays clean)
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

DECK = os.path.join(REPO, "tests", "fixtures", "jupiter_fdret")
KTAB = os.path.join(REPO, "tests", "fixtures", "ktables")
OUT = os.path.join(REPO, "tests", "goldens", "jupiter_retrieval.npz")

NITER = 3


def main():
    tmp = tempfile.mkdtemp(prefix="refret_")
    dst = os.path.join(tmp, "deck")
    shutil.copytree(DECK, dst)
    # deck's .kls points at ../ktables
    shutil.copytree(KTAB, os.path.join(tmp, "ktables"))
    cwd = os.getcwd()
    os.chdir(dst)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files("cirstest")
        # Force the reference down its NUMERICAL (finite-difference) Jacobian
        # path (ForwardModel_0.py:2251-2252 honours NUM==1 per element).  The
        # reference's ANALYTIC K on this deck neglects the hydrostatic-T
        # coupling and is wrong by ~10% of peak (see test_retrieval_e2e.py);
        # this repo's AD Jacobian matches the reference FD column to <1e-5 of
        # peak, so only the FD trajectory is a comparable oracle.
        Variables.NUM[:] = 1
        ny = len(Measurement.Y)
        OptimalEstimation, phi_hist, chisq_hist = ans.coreretOE(
            runname="cirstest", Variables=Variables, Measurement=Measurement,
            Atmosphere=Atmosphere, Spectroscopy=Spectroscopy, Scatter=Scatter,
            Stellar=Stellar, Surface=Surface, CIA=CIA, Layer=Layer,
            Telluric=None, NITER=NITER, PHILIMIT=Retrieval.PHILIMIT, NCores=2,
            return_phi_and_chisq_history=True,
        )
        np.savez(
            OUT,
            niter=NITER,
            philimit=Retrieval.PHILIMIT,
            XA=OptimalEstimation.XA,
            XN=OptimalEstimation.XN,
            Y=OptimalEstimation.Y,
            YN=OptimalEstimation.YN,
            PHI=OptimalEstimation.PHI,
            CHISQ=OptimalEstimation.CHISQ,
            PHI_HIST=np.asarray(phi_hist, dtype=float),
            CHISQ_HIST=np.asarray(chisq_hist, dtype=float),
            ST=OptimalEstimation.ST,
        )
        print("wrote", OUT)
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
