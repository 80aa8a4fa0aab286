"""Fixture deck + golden for the multiple-scattering nadir forward model.

Copies the reference Jupiter angled-scattering deck, rewires its .kls to the
synthetic fixture k-tables (tools/gen_fixtures.py must have run first),
truncates the .spx to 60 channels to keep the pure-Python oracle tractable,
and stores golden SPECONV + per-layer taus.

The oracle's numba-stubbed ``matmul`` (a Python triple loop) is replaced by
np.matmul — numerically the same contraction at C speed.

Run: python tools/gen_scatter_fixture.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

import archnemesis.Multiple_Scattering_Core as msc  # noqa: E402

msc.matmul = np.matmul

from tools.gen_fixtures import FIXTURES, GOLDENS, localize_deck  # noqa: E402

N_CHANNELS = 60


def truncate_spx(deck_dir, runname="cirstest"):
    path = os.path.join(deck_dir, runname + ".spx")
    with open(path) as f:
        lines = f.readlines()
    header = lines[0]
    nconv = int(lines[1].split()[0])
    nav_line = lines[2]
    geom_line = lines[3]
    chans = lines[4 : 4 + nconv]
    with open(path, "w") as f:
        f.write(header)
        f.write(f"        {N_CHANNELS}\n")
        f.write(nav_line)
        f.write(geom_line)
        f.writelines(chans[:N_CHANNELS])


def main():
    ktab_dir = os.path.join(FIXTURES, "ktables")
    kt = [
        os.path.join(ktab_dir, f)
        for f in sorted(os.listdir(ktab_dir))
        if f.endswith(".kta")
    ]
    # .kls order must match the deck's gas order (c2h2,c2h6,ch4 x3,ph3,nh3)
    order = ["c2h2", "c2h6", "ch4_1", "ch4_2", "ch4_3", "ph3", "nh3"]
    kt = [os.path.join(ktab_dir, f"{n}_synth.kta") for n in order]

    deck = localize_deck(
        "Jupiter_CIRS_angled_thermal_emission_scattering", "jupiter_scatter",
        kt,
    )
    truncate_spx(deck)

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
        # Skip state-vector application: this golden isolates the scattering
        # RT on the raw deck profiles (the deck's .apr uses models 47/444,
        # exercised separately once implemented).
        fm.subprofretg = lambda: None
        SPECONV = fm.nemesisfm()
        L = fm.LayerX
        out = os.path.join(GOLDENS, "jupiter_scatter_fm.npz")
        np.savez(
            out,
            SPECONV=SPECONV,
            WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
            TAUGAS=L.TAUGAS, TAUCIA=L.TAUCIA, TAURAY=L.TAURAY,
            TAUDUST=L.TAUDUST, TAUSCAT=L.TAUSCAT, TAUTOT=L.TAUTOT,
            TAUCLSCAT=L.TAUCLSCAT,
        )
        print("wrote", out, "SPECONV", SPECONV.shape)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
