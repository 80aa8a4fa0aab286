"""Build self-contained test fixture decks + golden data from the reference.

The reference mount ships the Jupiter/Mars test decks but NOT their opacity
tables (ktab_Jupiter_CIRS_nadir/*.kta, lbltab_mars/*.lta are absent). This
script makes the decks runnable:

1. copies each deck's text inputs into tests/fixtures/<name>/;
2. generates *synthetic but physically plausible* correlated-k tables in the
   NEMESIS .kta binary format (written with the reference's own write_ktable
   so read/write stay self-consistent) and rewires the .kls to them;
3. runs the reference implementation (pure-Python via the numba stub) on the
   fixture decks and stores golden outputs — layer properties, per-layer
   optical depths, spectra — in tests/goldens/*.npz.

The goldens are the correctness contract: the TPU framework must reproduce
them at rtol 1e-5 (f64). Run: ``python tools/gen_fixtures.py``
"""

import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()
from archnemesis.Spectroscopy_0 import write_ktable as _write_ktable  # noqa: E402

FIXTURES = os.path.join(REPO, "tests", "fixtures")
GOLDENS = os.path.join(REPO, "tests", "goldens")
REF_DECKS = "/root/reference/tests/files"

# ---------------------------------------------------------------------------
# Synthetic k-tables
# ---------------------------------------------------------------------------

# gases of the Jupiter CIRS deck (.kls order): name, gasID, isoID
JUPITER_GASES = [
    ("c2h2", 26, 0),
    ("c2h6", 27, 0),
    ("ch4_1", 6, 1),
    ("ch4_2", 6, 2),
    ("ch4_3", 6, 3),
    ("ph3", 28, 0),
    ("nh3", 11, 0),
]

VMIN, DELV, NWAVE = 5.0, 2.5, 599  # matches deck's 5-1500 cm-1 2.5 grid
NG = 20
NPRESS, NTEMP = 15, 12
PRESS_LEVELS = np.logspace(-8, np.log10(20.0), NPRESS)  # atm
TEMP_LEVELS = np.linspace(70.0, 400.0, NTEMP)  # K


def g_ordinates(ng):
    x, w = np.polynomial.legendre.leggauss(ng)
    return 0.5 * (x + 1.0), 0.5 * w


def synth_ktable(seed, gas_idx):
    """Smooth, banded absorption coefficient k(wave, g, P, T) in cm^2.

    A few Gaussian bands on a weak continuum; k grows with g (k-distribution
    ordering), mild power laws in P and T. Magnitudes chosen so the Jupiter
    deck's optically thickest layers reach tau of order unity..tens.
    """
    rng = np.random.default_rng(seed)
    wave = VMIN + DELV * np.arange(NWAVE)
    g_ord, _ = g_ordinates(NG)

    nbands = 4 + gas_idx % 3
    centers = rng.uniform(50.0, 1450.0, nbands)
    widths = rng.uniform(30.0, 140.0, nbands)
    amps = 10 ** rng.uniform(-2.0, 0.0, nbands)
    band = 1e-4 * np.ones_like(wave)
    for c, s, a in zip(centers, widths, amps):
        band = band + a * np.exp(-0.5 * ((wave - c) / s) ** 2)
    k0 = 2.0e-22 * band  # cm^2 molecule^-1 peak scale

    # g-dependence: lognormal-ish spread, strictly increasing in g
    spread = 2.0 + 1.5 * (gas_idx % 4) / 3.0
    gfac = np.exp(spread * (g_ord - 0.7))

    tfac = (TEMP_LEVELS / 150.0) ** (-(0.5 + 0.3 * (gas_idx % 3)))
    pfac = (PRESS_LEVELS / 1.0) ** 0.15  # weak pressure dependence
    pfac = pfac / pfac.max()

    k = (
        k0[:, None, None, None]
        * gfac[None, :, None, None]
        * pfac[None, None, :, None]
        * tfac[None, None, None, :]
    )
    return k  # (nwave, ng, npress, ntemp)


def write_jupiter_ktables(outdir):
    os.makedirs(outdir, exist_ok=True)
    g_ord, del_g = g_ordinates(NG)
    names = []
    for i, (name, gid, iso) in enumerate(JUPITER_GASES):
        k = synth_ktable(1000 + i, i)
        path = os.path.join(outdir, f"{name}_synth.kta")
        _write_ktable(
            path,
            gid,
            iso,
            np.asarray(g_ord, dtype=np.float64),
            np.asarray(del_g, dtype=np.float64),
            PRESS_LEVELS,
            TEMP_LEVELS,
            NWAVE,
            VMIN,
            DELV,
            0.0,
            k,
        )
        names.append(path)
        print("wrote", path)
    return names


def localize_deck(src_name, dst_name, ktable_paths):
    src = os.path.join(REF_DECKS, src_name)
    dst = os.path.join(FIXTURES, dst_name)
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    os.chmod(dst, 0o755)
    for f in os.listdir(dst):
        os.chmod(os.path.join(dst, f), 0o644)
    kls = [f for f in os.listdir(dst) if f.endswith(".kls")]
    for f in kls:
        with open(os.path.join(dst, f)) as fh:
            n = len([ln for ln in fh if ln.strip()])
        rel = [os.path.relpath(p, dst) for p in ktable_paths[:n]]
        with open(os.path.join(dst, f), "w") as fh:
            fh.write("\n".join(rel) + "\n")
    return dst


# ---------------------------------------------------------------------------
# Golden generation
# ---------------------------------------------------------------------------


def read_deck(deck_dir, runname="cirstest"):
    cwd = os.getcwd()
    os.chdir(deck_dir)
    try:
        return ans.Files.read_input_files(runname)
    finally:
        os.chdir(cwd)


def golden_layering(deck_dir, out_npz):
    cwd = os.getcwd()
    os.chdir(deck_dir)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files("cirstest")
        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        fm.subprofretg()
        fm.calc_path()
        L = fm.LayerX
        atm = fm.AtmosphereX
        np.savez(
            out_npz,
            # inputs (post-subprofretg profiles)
            H=atm.H, P=atm.P, T=atm.T, VMR=atm.VMR, DUST=atm.DUST,
            PARAH2=atm.PARAH2 if atm.PARAH2 is not None else np.zeros_like(atm.H),
            MOLWT=atm.MOLWT, RADIUS=atm.RADIUS, ID=atm.ID, ISO=atm.ISO,
            LATITUDE=atm.LATITUDE, PLANET=int(atm.IPLANET), AMFORM=int(atm.AMFORM),
            NLAY=L.NLAY, LAYTYP=int(L.LAYTYP), LAYINT=int(L.LAYINT),
            LAYHT=L.LAYHT, LAYANG=L.LAYANG if L.LAYANG is not None else 0.0,
            DUST_UNITS_FLAG=(
                np.asarray(L.DUST_UNITS_FLAG)
                if L.DUST_UNITS_FLAG is not None
                else np.array([])
            ),
            # golden outputs
            BASEH=L.BASEH, BASEP=L.BASEP, BASET=L.BASET, DELH=L.DELH,
            HEIGHT=L.HEIGHT, PRESS=L.PRESS, TEMP=L.TEMP, TOTAM=L.TOTAM,
            AMOUNT=L.AMOUNT, PP=L.PP, CONT=L.CONT, FRAC=L.FRAC, LAYSF=L.LAYSF,
        )
        print("wrote", out_npz)
    finally:
        os.chdir(cwd)


def golden_forward_model(deck_dir, out_npz):
    cwd = os.getcwd()
    os.chdir(deck_dir)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files("cirstest")
        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        SPECONV = fm.nemesisfm()
        L = fm.LayerX
        np.savez(
            out_npz,
            SPECONV=SPECONV,
            WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
            TAUGAS=L.TAUGAS, TAUCIA=L.TAUCIA, TAURAY=L.TAURAY,
            TAUDUST=L.TAUDUST, TAUSCAT=L.TAUSCAT, TAUTOT=L.TAUTOT,
        )
        print("wrote", out_npz)
    finally:
        os.chdir(cwd)


def main():
    os.makedirs(FIXTURES, exist_ok=True)
    os.makedirs(GOLDENS, exist_ok=True)

    ktab_dir = os.path.join(FIXTURES, "ktables")
    kt = write_jupiter_ktables(ktab_dir)

    layer_deck = localize_deck("Jupiter_test_layer", "jupiter_layer", kt)
    golden_layering(layer_deck, os.path.join(GOLDENS, "jupiter_layering.npz"))

    nadir_deck = localize_deck(
        "Jupiter_CIRS_nadir_thermal_emission", "jupiter_nadir", kt
    )
    golden_forward_model(
        nadir_deck, os.path.join(GOLDENS, "jupiter_nadir_fm.npz")
    )


if __name__ == "__main__":
    main()
