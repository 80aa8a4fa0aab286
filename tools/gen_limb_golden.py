"""Limb thermal-emission fixture + oracle golden.

Builds tests/fixtures/jupiter_limb/ from the Jupiter CIRS nadir deck by
rewriting the .spx to three limb geometries (EMISS_ANG=-1 => tangent
heights in the SOL_ANG column, reference Measurement_0.read_spx /
calc_path_L ForwardModel_0.py:3375), then runs the reference nemesisLfm
to produce the golden spectra (tests/goldens/jupiter_limb_fm.npz) and
fills the .spx measured column with the oracle spectrum + 5% error.

Run: python tools/gen_limb_golden.py  (slow: pure-Python oracle)
"""

import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

SRC = os.path.join(REPO, "tests", "fixtures", "jupiter_nadir")
DST = os.path.join(REPO, "tests", "fixtures", "jupiter_limb")
OUT = os.path.join(REPO, "tests", "goldens", "jupiter_limb_fm.npz")

TANHE_KM = [0.0, 60.0, 150.0]
VCONV = np.arange(595.0, 795.0 + 1e-6, 2.0)  # subset of the CIRS grid


def write_spx(path, vconv, meas, err, tanhe):
    ngeom = len(tanhe)
    with open(path, "w") as f:
        f.write("0.0  0.0  0.0  %d\n" % ngeom)
        for ig in range(ngeom):
            f.write("%d\n1\n" % len(vconv))
            # flat flon sol(=tanhe) emiss azi wgeom
            f.write("0.0 0.0 %.4f -1.0 0.0 1.0\n" % tanhe[ig])
            for j, v in enumerate(vconv):
                f.write("%10.5f %14.6e %14.6e\n"
                        % (v, meas[j, ig], err[j, ig]))


def main():
    os.makedirs(DST, exist_ok=True)
    for fn in os.listdir(SRC):
        if fn.startswith("cirstest.") or fn.endswith(".ref") or \
                fn.endswith(".dat"):
            if fn in ("cirstest.spx",):
                continue
            shutil.copyfile(os.path.join(SRC, fn), os.path.join(DST, fn))

    nv = len(VCONV)
    dummy = np.full((nv, len(TANHE_KM)), 1e-9)
    write_spx(os.path.join(DST, "cirstest.spx"), VCONV, dummy,
              0.05 * dummy, TANHE_KM)

    cwd = os.getcwd()
    os.chdir(DST)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files("cirstest")
        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisLfm()
        print("SPECONV", SPECONV.shape)
    finally:
        os.chdir(cwd)

    np.savez(OUT, VCONV=VCONV, TANHE=np.asarray(TANHE_KM), SPECONV=SPECONV)
    print("wrote", OUT)

    # make the deck a coherent retrieval input: meas = oracle + 5% error
    err = np.abs(SPECONV) * 0.05 + 1e-12
    write_spx(os.path.join(DST, "cirstest.spx"), VCONV, SPECONV, err,
              TANHE_KM)
    print("fixture at", DST)


if __name__ == "__main__":
    main()
