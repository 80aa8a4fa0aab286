"""Golden data for the multiple-scattering core: reference scloud11wave_core
on small synthetic inputs (pure-Python oracle via the numba stub).

Cases cover: thermal-only (no sun), sun+thermal, Lambert-like surface via
brdf_matrix, wide tau range (doubling ladder), NF>0 Fourier terms, Rayleigh
mixed with one HG aerosol mode.

Run: python tools/gen_scatter_golden.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

OUT = os.path.join(REPO, "tests", "goldens", "scatter_core.npz")

# Jupiter deck quadrature (.set file, 5-point Gauss-Lobatto)
MU = np.array([0.165278957666387, 0.477924949810444, 0.738773865105505,
               0.919533908166459, 1.0])
WTMU = np.array([0.327539761183898, 0.292042683679684, 0.224889342063117,
                 0.133305990851069, 2.222222222222220e-2])

NWAVE, NG, NLAY, NMU, NCONT = 4, 2, 8, 5, 1
NF, NPHI = 2, 40


def build_inputs(rng):
    vwaves = np.linspace(600.0, 630.0, NWAVE)
    # HG params per wave
    f = np.full(NWAVE, 0.5)
    g1 = np.full(NWAVE, 0.5)
    g2 = np.full(NWAVE, -0.5)
    ntheta = 10
    phasarr = np.zeros((NCONT, NWAVE, 2, ntheta))
    # wrapper layout: [...,0,-1]=f, [...,0,-2]=g1, [...,0,-3]=g2 then flipped
    phasarr[0, :, 0, -1] = f
    phasarr[0, :, 0, -2] = g1
    phasarr[0, :, 0, -3] = g2
    phasarr[0, :, 1, :] = np.cos(np.deg2rad(np.linspace(0, 180, ntheta)))
    phasarr = phasarr[:, :, :, ::-1]

    bnu = rng.uniform(1e-8, 1e-7, (NWAVE, NLAY))
    # wide range of optical depths incl. thin + thick layers
    taus = 10 ** rng.uniform(-4, 1.0, (NWAVE, NG, NLAY))
    tauray = 0.1 * np.min(taus, axis=1)
    tauscat_aero = 0.4 * np.min(taus, axis=1)
    omegas = (tauray[:, None, :] + tauscat_aero[:, None, :]) / taus
    omegas = np.clip(omegas, 0, 1)
    lfrac = np.ones((NWAVE, NCONT, NLAY))
    radg = rng.uniform(1e-8, 5e-8, (NWAVE, NMU))
    solar = np.full(NWAVE, 2.0e-7)
    return dict(
        vwaves=vwaves, phasarr=phasarr, bnu=bnu, taus=taus, tauray=tauray,
        tauscat_aero=tauscat_aero, omegas=omegas, lfrac=lfrac, radg=radg,
        solar=solar, f=f, g1=g1, g2=g2,
    )


def main():
    from archnemesis.Multiple_Scattering_Core import scloud11wave_core

    rng = np.random.default_rng(7)
    inp = build_inputs(rng)

    sol_angs = np.array([30.0, 60.0])
    emiss_angs = np.array([20.0, 45.0])
    aphis = np.array([0.0, 110.0])

    cases = {}
    for name, (lowbc, sun) in {
        "thermal": (0, False),
        "sun": (0, True),
        "surface_sun": (1, True),
    }.items():
        solar = inp["solar"] if sun else np.zeros(NWAVE)
        if lowbc:
            brdf = np.zeros((NWAVE, NMU, NMU, NF + 1))
            brdf[..., 0] = 0.3 / np.pi  # Lambert albedo 0.3, ic=0 only
        else:
            brdf = np.zeros((NWAVE, NMU, NMU, NF + 1))
        rad = scloud11wave_core(
            phasarr=inp["phasarr"], radg=inp["radg"], sol_angs=sol_angs,
            emiss_angs=emiss_angs, solar=solar, aphis=aphis, lowbc=lowbc,
            brdf_matrix=brdf, mu1=MU, wt1=WTMU, nf=NF, vwaves=inp["vwaves"],
            bnu=inp["bnu"], taus=inp["taus"], tauray=inp["tauray"],
            omegas_s=inp["omegas"], nphi=NPHI, iray=1, imie=0,
            lfrac=inp["lfrac"],
        )  # (npath, ng, nwave)
        cases[f"RAD_{name}"] = np.transpose(rad, (2, 1, 0))  # (nwave,ng,npath)
        print(name, cases[f"RAD_{name}"].ravel()[:4])

    np.savez(
        OUT,
        MU=MU, WTMU=WTMU, NF=NF, NPHI=NPHI,
        SOL_ANGS=sol_angs, EMISS_ANGS=emiss_angs, APHIS=aphis,
        **{k: v for k, v in inp.items() if k != "phasarr"},
        **cases,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
