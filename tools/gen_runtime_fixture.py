"""Fixture deck + golden for the runtime line-by-line (ILBL=1) nadir
forward model: a small synthetic Mars-like CO atmosphere over the CO 2-0
band, line data from the CO file bundled with the reference tests.

Run: python tools/gen_runtime_fixture.py
"""

import os
import sys
from copy import deepcopy

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

FIXTURES = os.path.join(REPO, "tests", "fixtures")
GOLDENS = os.path.join(REPO, "tests", "goldens")
LINE_H5 = "/root/reference/tests/files/linedata/CO_1_ambient_AIR.h5"

NPRO = 15


def write_deck(deck):
    os.makedirs(deck, exist_ok=True)
    h_km = np.linspace(0.0, 60.0, NPRO)
    p_atm = 6.0e-3 * np.exp(-h_km / 11.0)
    t = 210.0 - 1.2 * h_km
    vmr_co2 = np.full(NPRO, 0.96)
    vmr_co = np.full(NPRO, 0.04)

    with open(os.path.join(deck, "cirstest.ref"), "w") as f:
        f.write("           0\n           1\n")
        f.write(f"   4   0.00  {NPRO} 2   43.45\n")
        f.write("   2    0\n   5    1\n")
        f.write("  H(km)   P(atm)   T(K)   CO2   CO\n")
        for i in range(NPRO):
            f.write(
                f"  {h_km[i]:.4f}  {p_atm[i]:.6e}  {t[i]:.4f}"
                f"  {vmr_co2[i]:.6e}  {vmr_co[i]:.6e}\n"
            )

    with open(os.path.join(deck, "cirstest.inp"), "w") as f:
        f.write("0 0 1\n0.0\nnoisespec.dat\n-1\n0.1\n1 1\n0\n0\n")
    with open(os.path.join(deck, "noisespec.dat"), "w") as f:
        f.write("2\n0.\t0.\n10000.  0.\n")
    with open(os.path.join(deck, "cirstest.fla"), "w") as f:
        f.write("0\n0\n0\n0\n0\n0\n0\n0\n0\n")
    with open(os.path.join(deck, "cirstest.set"), "w") as f:
        f.write(
            "*" * 57 + "\n"
            " Number of zenith angles :  5\n"
            "  0.165278957666387       0.327539761183898\n"
            "  0.477924949810444       0.292042683679684\n"
            "  0.738773865105505       0.224889342063117\n"
            "  0.919533908166459       0.133305990851069\n"
            "   1.00000000000000       2.222222222222220E-002\n"
            " Number of fourier components :  0\n"
            " Number of azimuth angles for fourier analysis : 100\n"
            " Sunlight on(1) or off(0) :  0\n"
            " Distance from Sun (AU) :   1.52\n"
            " Lower boundary cond. Thermal(0) Lambert(1) :  0\n"
            " Ground albedo :   0.000\n"
            " Surface temperature :    0.000\n"
            + "*" * 57 + "\n"
            " Alt. at base of bot.layer (not limb) :   0.00\n"
            " Number of atm layers :  10\n"
            " Layer type :  1\n"
            " Layer integration :  1\n"
        )

    vconv = np.arange(2120.0, 2180.0, 1.0)
    with open(os.path.join(deck, "cirstest.spx"), "w") as f:
        f.write("      0.0000       0.00000       0.00000           1\n")
        f.write(f"        {vconv.size}\n         1\n")
        f.write("     0.00000    0.00000    0.00000    0.00000    0.00000    1.00000\n")
        for v in vconv:
            f.write(f"      {v:.4f}  1.0e-08  5.0e-10\n")

    with open(os.path.join(deck, "cirstest.lls"), "w") as f:
        f.write(
            "WAVE             2110.0 2190.0 0.05\n"
            "LINESHAPE        VOIGT\n"
            "WN_CALC_WINDOW   25\n"
            "WN_APPROX_WINDOW 75\n"
            "AMB_GAS          AIR\n"
            "INCLUDE_CONTINUUM False\n"
            "USE_CACHE        False\n"
            f"DBASE_PF         {LINE_H5}\n"
            f"DBASE_LD         {LINE_H5}\n"
            f"DBASE_PC         {LINE_H5}\n"
            "\tMOL CO 1\n"
            "END_BLOCK\n"
        )

    with open(os.path.join(deck, "aerosol.ref"), "w") as f:
        f.write(f"{NPRO} 1\n")
        for i in range(NPRO):
            f.write(f"{h_km[i]:.4f} 0.0\n")
    with open(os.path.join(deck, "cirstest.xsc"), "w") as f:
        f.write(" 1\n")
        for w in (2000.0, 2300.0):
            f.write(f" {w:.1f} 0.0\n 0.0\n")

    with open(os.path.join(deck, "cirstest.apr"), "w") as f:
        f.write("*** header ***\n1\n0 0 0\ntestapr.dat\n")
    with open(os.path.join(deck, "testapr.dat"), "w") as f:
        f.write(f"{NPRO} 1.5\n")
        for i in range(NPRO):
            f.write(f"{p_atm[i]:.6e} {t[i]:.4f} 5.0\n")


def main():
    deck = os.path.join(FIXTURES, "co_runtime")
    write_deck(deck)
    cwd = os.getcwd()
    os.chdir(deck)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files(
            "cirstest"
        )
        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisfm()
        L = fm.LayerX
        out = os.path.join(GOLDENS, "co_runtime_fm.npz")
        np.savez(
            out,
            SPECONV=SPECONV,
            WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
            TAUGAS=L.TAUGAS, TAUTOT=L.TAUTOT,
        )
        print("wrote", out, SPECONV.shape)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
