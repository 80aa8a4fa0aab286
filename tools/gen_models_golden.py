"""Golden data for the model-parameterisation library: for each model id,
a synthetic single-model .apr is parsed by the reference (XA/SA/LX) and
applied by the reference subprofretg on the Jupiter fixture atmosphere;
the resulting profiles are stored for parity testing of our from_apr +
apply_state.

Run: python tools/gen_models_golden.py  (after gen_fixtures.py)
"""

import os
import shutil
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

# each case: (name, apr text, aux files {fname: text})
HEADER = "*** synthetic model-test apr ***\n"


def profile_file(pref_atm, vals, errs, clen=1.5):
    lines = [f"{len(vals)} {clen}"]
    for p, v, e in zip(pref_atm, vals, errs):
        lines.append(f"{p:.8e} {v:.8e} {e:.8e}")
    return "\n".join(lines) + "\n"


def build_cases(atm):
    pref = atm.P / 101325.0
    npro = atm.NP
    rng = np.random.default_rng(21)
    tvals = 150.0 + 50.0 * rng.random(npro)
    terrs = np.full(npro, 5.0)
    svals = 1.0 + 0.3 * rng.random(npro)
    serrs = np.full(npro, 0.1)
    gvals = 1e-6 * (1 + rng.random(npro))
    gerrs = 0.2 * gvals

    cases = {}
    cases["m0_temp"] = (
        HEADER + "1\n0 0 0\ntprof.dat\n",
        {"tprof.dat": profile_file(pref, tvals, terrs)},
    )
    cases["m1_knee"] = (
        HEADER + "1\n11 0 1\n0.5\n1.9e-4 0.4e-4\n0.3 0.05\n",
        {},
    )
    cases["m2_scale"] = (HEADER + "1\n26 0 2\n1.7 0.2\n", {})
    cases["m3_logscale"] = (HEADER + "1\n27 0 3\n1.4 0.3\n", {})
    cases["m4_kneevar"] = (
        HEADER + "1\n11 0 4\n0.6 0.1\n1.8e-4 0.4e-4\n0.35 0.05\n",
        {},
    )
    cases["m9_cloud"] = (
        HEADER + "1\n-1 0 9\n-20.0 5.0\n4.0 0.8\n0.25 0.05\n",
        {},
    )
    cases["m20_kneetrop"] = (
        HEADER + "1\n11 0 20\n0.6 0.005\n1.8e-4 0.4e-4\n0.35 0.05\n",
        {},
    )
    cases["m32_cloudp"] = (
        HEADER + "1\n-1 0 32\n0.8 0.2\n3.0 0.5\n0.3 0.06\n",
        {},
    )
    cases["m45_ch4"] = (
        HEADER + "1\n6 1 45\n1.8e-3 0.4e-3\n0.30 0.05\n1.0e-3 0.3e-3\n",
        {},
    )
    cases["m47_gauss"] = (
        HEADER + "1\n-1 0 47\n3.0 0.6\n0.4 0.1\n0.25 0.05\n",
        {},
    )
    cases["m49_refgas"] = (
        HEADER + "1\n26 0 49\n27 0\n0.05 0.01\n",
        {},
    )
    cases["m50_scaleprof"] = (
        HEADER + "1\n27 0 50\nsprof.dat\n",
        {"sprof.dat": profile_file(pref, svals, serrs)},
    )
    cases["m51_setprof"] = (
        HEADER + "1\n26 0 51\ngprof.dat\n",
        {"gprof.dat": profile_file(pref, gvals, gerrs)},
    )
    cases["mm1_aeroprof"] = (
        HEADER + "1\n-1 0 -1\naprof.dat\n",
        {"aprof.dat": profile_file(pref, gvals * 1e9, 0.3 * gvals * 1e9)},
    )
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

    os.makedirs(OUTDIR, exist_ok=True)
    cases = build_cases(Atmosphere)
    out = {}
    for name, (apr, aux) in cases.items():
        cdir = os.path.join(OUTDIR, name)
        os.makedirs(cdir, exist_ok=True)
        with open(os.path.join(cdir, "test.apr"), "w") as f:
            f.write(apr)
        for fn, text in aux.items():
            with open(os.path.join(cdir, fn), "w") as f:
                f.write(text)

        os.chdir(cdir)
        try:
            V = ans.Variables_0()
            V.read_apr(
                "test", Atmosphere.NP, Atmosphere.NVMR, Atmosphere.NDUST,
                Atmosphere.NLOCATIONS,
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
            if name == "m9_cloud":
                # the reference wrapper for model 9 transposes its parameter
                # slices (tau<->href, model_9.py:71-73), feeding calculate
                # nonsense; golden from the documented semantics instead
                from archnemesis.Models import Models as _M
                from archnemesis.enum import AtmosphericProfileTypeEnum as _T
                a = fm.AtmosphereX
                a, _ = _M[9].calculate(
                    a, _T.AEROSOL_DENSITY, 0,
                    np.exp(V.XN[0]), np.exp(V.XN[1]), V.XN[2],
                )
            elif name == "m49_refgas":
                # the reference subprofretg wrapper for model 49 has an
                # xmap-shape bug; call the model's calculate directly
                a = fm.AtmosphereX
                ipar = int(np.where((a.ID == 26) & (a.ISO == 0))[0][0])
                scale = np.exp(V.XN[0])
                from archnemesis.Models import Models as _M
                a, _ = _M[49].calculate(a, ipar, scale, 27, 0)
            else:
                fm.subprofretg()
                a = fm.AtmosphereX
            renorm = np.zeros(a.NDUST)
            for kk, vv in a.DUST_RENORMALISATION.items():
                renorm[kk] = vv
            nx = V.NX
            out[f"{name}_XA"] = V.XA[:nx]
            out[f"{name}_SA"] = V.SA[:nx, :nx]
            out[f"{name}_LX"] = V.LX[:nx]
            out[f"{name}_T"] = a.T
            out[f"{name}_VMR"] = a.VMR
            out[f"{name}_DUST"] = a.DUST
            out[f"{name}_H"] = a.H
            out[f"{name}_RENORM"] = renorm
            print(name, "NX", nx)
        finally:
            os.chdir(cwd)

    np.savez(os.path.join(GOLDENS, "models_apply.npz"), **out)
    print("wrote", os.path.join(GOLDENS, "models_apply.npz"))


if __name__ == "__main__":
    main()
