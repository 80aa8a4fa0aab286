"""Golden data for the OE retrieval: reference analytic Jacobian + OE-step
quantities + a short LM trajectory on the Jupiter nadir deck.

Run: python tools/gen_oe_golden.py  (slow: pure-Python oracle)
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

DECK = os.path.join(REPO, "tests", "fixtures", "jupiter_nadir")
OUT = os.path.join(REPO, "tests", "goldens", "jupiter_oe.npz")


def main():
    cwd = os.getcwd()
    os.chdir(DECK)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files("cirstest")

        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        print("computing analytic Jacobian (nemesisfmg)...")
        YN, KK = fm.jacobian_nemesis()
        print("YN", YN.shape, "KK", KK.shape)

        # OE single-step quantities
        oe = ans.OptimalEstimation_0()
        oe.NITER = 2
        oe.PHILIMIT = Retrieval.PHILIMIT
        oe.NX = Variables.NX
        ny = len(Measurement.Y)
        oe.NY = ny
        oe.edit_XA(Variables.XA)
        oe.edit_XN(Variables.XN)
        oe.edit_SA(Variables.SA)
        oe.edit_Y(Measurement.Y)
        oe.edit_SE(np.diag(Measurement.SE[:ny].diagonal() if Measurement.SE.ndim == 2 else Measurement.SE[:ny]))
        oe.edit_YN(YN)
        oe.edit_KK(KK)
        oe.calc_gain_matrix()
        oe.calc_phiret()
        x_out = oe.calc_next_xn()

        np.savez(
            OUT,
            XA=Variables.XA[: Variables.NX],
            XN=Variables.XN[: Variables.NX],
            SA=Variables.SA[: Variables.NX, : Variables.NX],
            LX=Variables.LX[: Variables.NX],
            Y=Measurement.Y,
            SE=oe.SE,
            YN=YN,
            KK=KK,
            DD=oe.DD,
            AA=oe.AA,
            PHI=oe.PHI,
            CHISQ=oe.CHISQ,
            X_OUT=x_out,
        )
        print("wrote", OUT)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
