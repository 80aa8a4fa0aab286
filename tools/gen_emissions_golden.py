"""Golden data for the non-LTE atmospheric-emissions subsystem.

Builds two synthetic emission look-up tables (one fluorescence, one
chemical) for gases in the bundled Jupiter CIRS nadir deck, writes them in
the reference's table format (Emissions_0.write_table_hdf5), and runs the
reference forward model with Emissions attached (ForwardModel_0.py:4018
calculate_layer_emission + :4171-4184 interpolation into the thermal
integral). The resulting spectrum is the correctness contract for
archnemesis_tpu.ops.emissions.

Run once: ``python tools/gen_emissions_golden.py``
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.refutils import import_reference  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
GOLDENS = os.path.join(REPO, "tests", "goldens")
EMISS_DIR = os.path.join(FIXTURES, "jupiter_emiss")


def build_emissions(ans, out_dir, calc_wave):
    """Synthetic NEM=2 emissions: NH3 fluorescence + C2H2 chemical.

    NOTE: the reference's calculate_layer_emission allocates
    EMI(Spectroscopy.NWAVE, NLAY) and fills it straight from the table grid
    (ForwardModel_0.py:4031,4070), so the table NWAVE must equal the windowed
    spectroscopy NWAVE; the table WAVE values are then interpolated onto the
    calc grid (:4177). We build the table on a slightly wider grid with the
    same point count so the interpolation is non-trivial.
    """
    em = ans.Emissions_0(NEM=2)
    nt = 4
    temp = np.array([80.0, 120.0, 180.0, 260.0])
    wave = np.linspace(calc_wave.min() - 4.0, calc_wave.max() + 6.0,
                       calc_wave.size)
    nwave = wave.size

    rng = np.random.default_rng(42)

    em.NGAS = np.array([1, 1], dtype="int32")
    em.ID = np.array([[11, 26]], dtype="int32")  # NH3, C2H2 (row: igas)
    em.ISO = np.array([[0, 0]], dtype="int32")
    em.EMTYPE = np.array([0, 1], dtype="int32")  # fluorescence, chemical
    em.ISPACE = 0  # wavenumber
    em.NWAVE = nwave
    em.WAVE = wave
    em.NT = nt
    em.TEMP = temp
    em.DIST_REF = np.array([5.2, 5.2])

    # smooth positive emission-rate tables, T-dependent
    k = np.zeros((nwave, nt, 2))
    for iemi in range(2):
        base = 3.0e-7 * (1.0 + rng.random(nwave))
        shape = np.exp(-((wave - (850.0 + 250.0 * iemi)) / 120.0) ** 2)
        for it in range(nt):
            k[:, it, iemi] = base * shape * (0.5 + 1.7 * it / (nt - 1.0))
    em.K = k
    em.RATE_COEFF = np.vstack(
        [np.zeros(nt), 1.0e-3 * (1.0 + np.linspace(0.0, 1.5, nt))]
    ).T  # (NT, NEM); only the chemical one is used

    os.makedirs(out_dir, exist_ok=True)
    em.LOCATION = [
        os.path.join(out_dir, "emiss_nh3_fluor.h5"),
        os.path.join(out_dir, "emiss_c2h2_chem.h5"),
    ]
    em.write_table_hdf5(0)
    em.write_table_hdf5(1)
    return em


def main():
    ans = import_reference()
    deck = os.path.join(FIXTURES, "jupiter_nadir")

    calc_wave = np.load(os.path.join(GOLDENS, "jupiter_nadir_fm.npz"))["WAVE"]
    em = build_emissions(ans, EMISS_DIR, calc_wave)

    cwd = os.getcwd()
    os.chdir(deck)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files(
            "cirstest"
        )
        # re-read header from the files we just wrote (exercises the
        # reference's read_header_table_hdf5 roundtrip)
        em2 = ans.Emissions_0(NEM=2)
        em2.LOCATION = list(em.LOCATION)
        em2.DIST_REF = em.DIST_REF
        em2.read_header_table_hdf5()

        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables, Emissions=em2,
        )
        SPECONV = fm.nemesisfm()
        solexist = bool(Stellar is not None and Stellar.SOLEXIST)
        dist = float(Stellar.DIST) if solexist else np.nan
        np.savez(
            os.path.join(GOLDENS, "jupiter_emissions_fm.npz"),
            SPECONV=SPECONV,
            WAVE=fm.SpectroscopyX.WAVE,
            VCONV=Measurement.VCONV,
            NCONV=Measurement.NCONV,
            SOLEXIST=solexist,
            DIST=dist,
            EM_WAVE=em.WAVE, EM_TEMP=em.TEMP, EM_K=em.K,
            EM_RATE_COEFF=em.RATE_COEFF, EM_DIST_REF=em.DIST_REF,
            EM_EMTYPE=np.asarray([int(t) for t in em2.EMTYPE]),
            EM_ID=em.ID, EM_ISO=em.ISO,
        )
        print("wrote", os.path.join(GOLDENS, "jupiter_emissions_fm.npz"))
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
