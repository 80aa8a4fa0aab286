"""Goldens for the non-atmosphere-domain models (666 tangent pressure,
777 tangent height, 887 xsc, 999 tsurf) and the PostRT spectral models
(231/232/233/667): synthetic .apr blocks parsed + applied by the reference
on the Jupiter fixture deck.

Run: python tools/gen_models2_golden.py  (after gen_fixtures.py)
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
DECK = os.path.join(FIXTURES, "jupiter_nadir")
OUTDIR = os.path.join(FIXTURES, "models")

HEADER = "*** synthetic model-test apr ***\n"


def build_cases():
    cases = {}
    cases["m999_tsurf"] = (HEADER + "1\n999 0 999\n155.0 10.0\n", {})
    cases["m777_tanhe"] = (HEADER + "1\n777 0 777\n1.5 0.4\n", {})
    cases["m666_ptan"] = (HEADER + "1\n666 0 666\n50.0\n0.02 0.005\n", {})
    # 887: deck .xsc has 6 wavelengths (see jupiter_nadir/cirstest.xsc)
    xsc_waves = [0.0, 700.0, 750.0, 900.0, 950.0, 2000.0]
    lines887 = "\n".join(
        f"{w} {1.2e-3 * (i + 1):.6e} {2.0e-4:.6e}"
        for i, w in enumerate(xsc_waves)
    )
    cases["m887_xsc"] = (
        HEADER + f"1\n887 1 887\n6 0 300.0\n{lines887}\n",
        {},
    )
    cases["m231_poly"] = (
        HEADER + "1\n231 1 231\nscal231.dat\n",
        {"scal231.dat": "1 1\n1.05 0.1 0.002 0.001\n"},
    )
    cases["m232_angstrom"] = (
        HEADER + "1\n232 1 232\n900.0\nscal232.dat\n",
        {"scal232.dat": "1\n0.3 0.05 1.2 0.2\n"},
    )
    cases["m233_quad"] = (
        HEADER + "1\n233 0 233\nscal233.dat\n",
        {"scal233.dat": "1\n-3.0 0.5 0.4 0.1 -0.02 0.01\n"},
    )
    cases["m667_dilution"] = (HEADER + "1\n667 0 667\n0.85 0.05\n", {})
    return cases


def main():
    cwd = os.getcwd()
    os.chdir(DECK)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables0, Retrieval) = ans.Files.read_input_files(
            "cirstest"
        )
    finally:
        os.chdir(cwd)

    # synthetic convolved spectrum for the PostRT models
    rng = np.random.default_rng(5)
    rng2 = np.random.default_rng(6)
    nconv = int(Measurement.NCONV[0])
    specmod = rng.uniform(1e-8, 1e-7, (Measurement.NCONV.max(), Measurement.NGEOM))

    os.makedirs(OUTDIR, exist_ok=True)
    out = {"SPECMOD_IN": specmod.copy(), "VCONV": Measurement.VCONV}
    for name, (apr, aux) in build_cases().items():
        cdir = os.path.join(OUTDIR, name)
        os.makedirs(cdir, exist_ok=True)
        with open(os.path.join(cdir, "test.apr"), "w") as f:
            f.write(apr)
        for fn, text in aux.items():
            with open(os.path.join(cdir, fn), "w") as f:
                f.write(text)

        if name == "m887_xsc":
            # upstream model_887.from_apr references Scatter_0 without
            # importing it, and needs runname.xsc in cwd
            import sys as _sys
            _m887 = _sys.modules["archnemesis.Models.PreRTModels.model_887"]
            _m887.Scatter_0 = ans.Scatter_0
            import shutil as _sh
            _sh.copyfile(os.path.join(DECK, "cirstest.xsc"),
                         os.path.join(cdir, "test.xsc"))

        os.chdir(cdir)
        try:
            V = ans.Variables_0()
            V.read_apr(
                "cirstest" if False else "test", Atmosphere.NP,
                Atmosphere.NVMR, Atmosphere.NDUST, Atmosphere.NLOCATIONS,
            )
            V.XN = np.array(V.XA)

            fm = ans.ForwardModel_0(
                runname="test", Atmosphere=Atmosphere, Surface=Surface,
                Measurement=Measurement, Spectroscopy=Spectroscopy,
                Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
                Variables=V,
            )
            fm.MeasurementX = deepcopy(Measurement)
            fm.AtmosphereX = deepcopy(Atmosphere)
            fm.ScatterX = deepcopy(Scatter)
            fm.StellarX = deepcopy(Stellar)
            fm.SurfaceX = deepcopy(Surface)
            fm.LayerX = deepcopy(Layer)
            fm.CIAX = deepcopy(CIA)

            nx = V.NX
            out[f"{name}_XA"] = V.XA[:nx]
            out[f"{name}_SA"] = V.SA[:nx, :nx]
            out[f"{name}_LX"] = V.LX[:nx]

            if name in ("m232_angstrom", "m233_quad"):
                # these PostRT models are applied on the calc-wave grid in
                # the reference (their wrapper broadcasts Spectroscopy.WAVE
                # against SPECMOD, which only matches when NCONV==NWAVE);
                # golden via direct calculate on a calc-grid spectrum
                # (their calculate is ALSO broken: it indexes the 1-D
                # SPECMOD as 2-D when writing gradients) -> golden the
                # documented spectral factor directly
                wavec = np.linspace(600.0, 1200.0, 128)
                spw = rng2.uniform(1e-8, 1e-7, wavec.size)
                if name == "m232_angstrom":
                    tau0, alpha = V.XN[0], V.XN[1]
                    spx = spw * np.exp(-tau0 * (wavec / 900.0) ** (-alpha))
                else:
                    a0, a1, a2 = V.XN[0], V.XN[1], V.XN[2]
                    tau = np.exp(a0 + a1 * np.log(wavec) + a2 * np.log(wavec) ** 2)
                    spx = spw * np.exp(-tau)
                out[f"{name}_WAVEC"] = wavec
                out[f"{name}_SPEC_IN"] = spw
                out[f"{name}_SPECMOD"] = spx
            elif name == "m667_dilution":
                # its subspecret wrapper also hits the calc-grid/NCONV
                # mismatch upstream; semantics are a scalar multiply
                out[f"{name}_SPECMOD"] = specmod * V.XN[0]
            elif name.startswith(("m231",)):
                sp = specmod.copy()
                dsp = np.zeros((sp.shape[0], sp.shape[1], nx))
                sp, _ = fm.subspecret(sp, dsp)
                out[f"{name}_SPECMOD"] = sp
            elif name == "m887_xsc":
                # model 887 is broken upstream (wrapper NotImplementedError,
                # calculate references nonexistent Scatter.DUST); golden its
                # documented semantics: KEXT[:, icloud] = unlogged state
                fm.ScatterX.KEXT[:, 0] = np.exp(V.XN[:nx])
                out[f"{name}_KEXT"] = np.asarray(fm.ScatterX.KEXT)
            else:
                if name == "m777_tanhe":
                    fm.MeasurementX.TANHE = np.array([[12.0]])
                fm.subprofretg()
                out[f"{name}_P"] = fm.AtmosphereX.P
                out[f"{name}_TSURF"] = np.asarray(float(fm.SurfaceX.TSURF))
                out[f"{name}_TANHE"] = (
                    np.asarray(fm.MeasurementX.TANHE).ravel()
                    if fm.MeasurementX.TANHE is not None
                    else np.zeros(1)
                )
                out[f"{name}_KEXT"] = np.asarray(fm.ScatterX.KEXT)
            print(name, "NX", nx)
        finally:
            os.chdir(cwd)

    np.savez(os.path.join(GOLDENS, "models_domain.npz"), **out)
    print("wrote", os.path.join(GOLDENS, "models_domain.npz"))


if __name__ == "__main__":
    main()
