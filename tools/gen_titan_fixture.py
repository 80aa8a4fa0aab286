"""Fixture + golden for the Titan FOV-averaged forward model: mixed
nadir + limb FOV points, LBL tables, SVP file, surface, FWHM>0 Gaussian
ILS. Deck truncated to 8 FOV points and 200 channels; synthetic CH3CN
.lta table (the real one is not shipped).

Run: python tools/gen_titan_fixture.py
"""

import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()
from archnemesis.Spectroscopy_0 import write_lbltable  # noqa: E402

FIXTURES = os.path.join(REPO, "tests", "fixtures")
GOLDENS = os.path.join(REPO, "tests", "goldens")
SRC = "/root/reference/tests/files/Titan_aveFOV"

N_CHAN = 200
KEEP_NAV = [0, 1, 2, 3, 4, 6, 7, 8]  # rows in the original 35-point FOV list

VMIN, DELV, NWAVE = 11.6535, 2.0e-7, 10000
NPRESS, NTEMP = 10, 7
PRESS_LEVELS = np.logspace(-7, 0.3, NPRESS)
TEMP_LEVELS = np.linspace(60.0, 200.0, NTEMP)


def synth_lta(path):
    wave = VMIN + DELV * np.arange(NWAVE)
    centres = np.array([11.6540, 11.65425, 11.65443, 11.65462, 11.6549])
    amps = np.array([1.0, 2.5, 1.8, 3.0, 1.2]) * 1e-19
    k = np.zeros((NWAVE, NPRESS, NTEMP))
    for ip, p in enumerate(PRESS_LEVELS):
        gam = 2.0e-4 * (p / 1.0) ** 0.4 + 4.0e-6
        for it, t in enumerate(TEMP_LEVELS):
            prof = np.full(NWAVE, 2e-22)
            for c, a in zip(centres, amps):
                prof += (
                    a * (t / 160.0) ** -0.7 * gam
                    / (np.pi * (gam**2 + (wave - c) ** 2))
                )
            k[:, ip, it] = prof
    write_lbltable(path, NPRESS, NTEMP, 50, 1, PRESS_LEVELS, TEMP_LEVELS,
                   NWAVE, VMIN, DELV, k)


def truncate_spx(path):
    lines = open(path).readlines()
    header = lines[0]
    nav = int(lines[2].split()[0])
    nav_rows = lines[3 : 3 + nav]
    chans = lines[3 + nav :]
    with open(path, "w") as f:
        f.write(header)
        f.write(f"{N_CHAN}\n{len(KEEP_NAV)}\n")
        for i in KEEP_NAV:
            f.write(nav_rows[i])
        f.writelines(chans[:N_CHAN])


def main():
    deck = os.path.join(FIXTURES, "titan_fov")
    if os.path.isdir(deck):
        shutil.rmtree(deck)
    os.makedirs(deck)
    for fn in ["ch3cn.inp", "ch3cn.fla", "ch3cn.set", "ch3cn.spx",
               "ch3cn.ref", "ch3cn.apr", "ch3cn.cia", "ch3cn.vpf",
               "ch3cn.sur", "aerosol.ref", "ch3cn.xsc", "ch3cn.sha"]:
        src = os.path.join(SRC, fn)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(deck, fn))
            os.chmod(os.path.join(deck, fn), 0o644)
    with open(os.path.join(deck, "NOISE.dat"), "w") as f:
        f.write("2\n0. 0.\n100. 0.\n")
    synth_lta(os.path.join(deck, "ch3cn_19-18.lta"))
    with open(os.path.join(deck, "ch3cn.lls"), "w") as f:
        f.write("./ch3cn_19-18.lta\n")
    truncate_spx(os.path.join(deck, "ch3cn.spx"))

    cwd = os.getcwd()
    os.chdir(deck)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files(
            "ch3cn"
        )
        fm = ans.ForwardModel_0(
            runname="ch3cn", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisfm()
        out = os.path.join(GOLDENS, "titan_fov_fm.npz")
        np.savez(
            out,
            SPECONV=SPECONV,
            WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
            XA=Variables.XA[: Variables.NX],
        )
        print("wrote", out, SPECONV.shape)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
