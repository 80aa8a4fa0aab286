"""Fixture + golden for the solar-occultation (limb transmission) forward
model: Mars CO deck in the single-HDF5 run format with synthetic .lta
line-by-line tables (the real lbltab_mars tables are not shipped).

Run: python tools/gen_so_fixture.py   (after gen_fixtures.py)
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
SRC = "/root/reference/tests/files/Mars_solar_occultation/mars_solocc.h5"

VMIN, DELV, NWAVE = 4167.0, 0.02, 1300  # 4167-4193 cm-1
NPRESS, NTEMP = 12, 8
PRESS_LEVELS = np.logspace(-8, -1, NPRESS)  # atm
TEMP_LEVELS = np.linspace(110.0, 280.0, NTEMP)

# (gas_id, iso_id, filename) for the three CO isotopologues
GASES = [(5, 1, "lbltab_co_iso1.lta"), (5, 2, "lbltab_co_iso2.lta"),
         (5, 3, "lbltab_co_iso3.lta")]


def synth_lbltable(seed, iso):
    """Synthetic monochromatic cross-sections: a comb of pressure- and
    temperature-dependent Lorentz-ish lines on a weak continuum."""
    rng = np.random.default_rng(seed)
    wave = VMIN + DELV * np.arange(NWAVE)
    centres = np.arange(4169.0, 4192.0, 3.1) + rng.uniform(-0.4, 0.4)
    strengths = 10 ** rng.uniform(-20.5, -19.0, centres.size) / iso
    k = np.zeros((NWAVE, NPRESS, NTEMP))
    for ip, p in enumerate(PRESS_LEVELS):
        for it, t in enumerate(TEMP_LEVELS):
            gamma = 0.06 * (p / 1.0e-3) ** 0.2 * (296.0 / t) ** 0.6 + 0.01
            prof = np.zeros_like(wave)
            for c, s in zip(centres, strengths):
                prof += s * (t / 200.0) ** -0.7 * gamma / (
                    np.pi * (gamma**2 + (wave - c) ** 2)
                )
            k[:, ip, it] = prof + 1e-26
    return k


def main():
    deck_dir = os.path.join(FIXTURES, "mars_so")
    os.makedirs(deck_dir, exist_ok=True)
    lta_dir = os.path.join(FIXTURES, "ltatables")
    os.makedirs(lta_dir, exist_ok=True)

    rel_paths = []
    for i, (gid, iso, name) in enumerate(GASES):
        path = os.path.join(lta_dir, name)
        k = synth_lbltable(500 + i, iso)
        write_lbltable(
            path, NPRESS, NTEMP, gid, iso, PRESS_LEVELS, TEMP_LEVELS,
            NWAVE, VMIN, DELV, k,
        )
        rel_paths.append(os.path.relpath(path, deck_dir))
        print("wrote", path)

    dst = os.path.join(deck_dir, "mars_solocc.h5")
    shutil.copyfile(SRC, dst)
    os.chmod(dst, 0o644)
    shutil.copyfile(SRC.replace(".h5", ".apr"),
                    os.path.join(deck_dir, "mars_solocc.apr"))
    import h5py

    with h5py.File(dst, "r+") as f:
        del f["Spectroscopy/LOCATION"]
        f["Spectroscopy"].create_dataset(
            "LOCATION", data=np.array([p.encode() for p in rel_paths])
        )

    # oracle golden
    cwd = os.getcwd()
    os.chdir(deck_dir)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval, Telluric) = ans.Files.read_input_files_hdf5(
            "mars_solocc"
        )
        fm = ans.ForwardModel_0(
            runname="mars_solocc", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisSOfm()
        L = fm.LayerX
        P = fm.PathX
        out = os.path.join(GOLDENS, "mars_so_fm.npz")
        np.savez(
            out,
            SPECONV=SPECONV,
            WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
            TANHE=np.asarray(Measurement.TANHE).ravel(),
            XA=Variables.XA[: Variables.NX],
            TAUGAS=L.TAUGAS, TAUCIA=L.TAUCIA, TAURAY=L.TAURAY,
            TAUDUST=L.TAUDUST, TAUTOT=L.TAUTOT,
            BASEH=L.BASEH, SCALE=P.SCALE, LAYINC=P.LAYINC,
            NLAYIN=P.NLAYIN,
        )
        print("wrote", out, "SPECONV", SPECONV.shape)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
