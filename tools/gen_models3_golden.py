"""Goldens for models 43 (Guillot TP), 62 (Madhusudhan-Seager TP),
110/111 (Venus clouds), 447 (Doppler shift).

Run: python tools/gen_models3_golden.py  (after gen_fixtures.py)
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

CASES = {
    "m62_madhu": HEADER + (
        "1\n0 0 62\n"
        "0.01 0.002\n"   # P1 (atm)
        "0.1 0.02\n"     # P2
        "2.0 0.4\n"      # P3
        "120.0 10.0\n"   # T0
        "0.6 0.1\n"      # alpha1
        "0.5 0.1\n"      # alpha2
    ),
    "m447_doppler": HEADER + "1\n447 0 447\n3.5 0.5\n",
}


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

    out = {}
    for name, apr in CASES.items():
        cdir = os.path.join(OUTDIR, name)
        os.makedirs(cdir, exist_ok=True)
        with open(os.path.join(cdir, "test.apr"), "w") as f:
            f.write(apr)
        os.chdir(cdir)
        try:
            V = ans.Variables_0()
            V.read_apr("test", Atmosphere.NP, Atmosphere.NVMR,
                       Atmosphere.NDUST, Atmosphere.NLOCATIONS)
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
            print(name, "NX", nx)
        finally:
            os.chdir(cwd)

    # model 43: its from_apr is broken upstream (constructor arity mismatch,
    # model_43.py:426 passes 6 args to a 3-4 arg base init) -> golden the
    # profile via direct calculate on the Jupiter atmosphere
    from archnemesis.Models import Models as _M

    a43 = deepcopy(Atmosphere)
    a43, _ = _M[43].calculate(
        a43, 0.3, 0.8, 1.0e-3, 0.2, 2.0, 5700.0, 6.96e8, 7.78e11, 150.0
    )
    out["m43_T"] = np.asarray(a43.T)

    # model 62: wrapper also broken upstream (assigns the (atm, xmap)
    # tuple to AtmosphereX, model_62.py:299-302) -> direct calculate
    a62 = deepcopy(Atmosphere)
    a62, _ = _M[62].calculate(a62, 0.01, 0.1, 2.0, 120.0, 0.6, 0.5)
    out["m62_T"] = np.asarray(a62.T)

    npro = 40
    h = np.linspace(0.0, 90.0e3, npro)
    venus = ans.Atmosphere_0(runname="venus")
    venus.NP = npro
    venus.NVMR = 2
    venus.NDUST = 4
    venus.IPLANET = 2
    venus.LATITUDE = 0.0
    venus.AMFORM = ans.enum.AtmosphericProfileFormatEnum.CALC_MOLECULAR_WEIGHT_DO_NOT_SCALE_VMR
    venus.edit_H(h)
    venus.edit_P(9.2e6 * np.exp(-h / 15.9e3))
    venus.edit_T(np.linspace(730.0, 170.0, npro))
    venus.ID = np.array([2, 9])
    venus.ISO = np.array([0, 0])
    venus.edit_VMR(np.stack([np.full(npro, 0.965),
                             np.full(npro, 1.5e-4)], axis=1))
    venus.edit_DUST(np.zeros((npro, 4)))

    a110 = deepcopy(venus)
    a110 = _M[110].calculate(a110, 0, 2.5)
    out["m110_H"] = h
    out["m110_DUST"] = np.asarray(a110.DUST)

    a111 = deepcopy(venus)
    a111 = _M[111].calculate(a111, 0, 1.0e-4, 5.0e-6, -1.5)
    out["m111_DUST"] = np.asarray(a111.DUST)
    out["m111_VMR"] = np.asarray(a111.VMR)

    np.savez(os.path.join(GOLDENS, "models_exo_venus.npz"), **out)
    print("wrote", os.path.join(GOLDENS, "models_exo_venus.npz"))


if __name__ == "__main__":
    main()
