"""Goldens for surface BRDF models (Lambert/Hapke/Oren-Nayar) and the
single-scattering plane-parallel kernel, from the reference oracle.

Run: python tools/gen_surface_golden.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

OUT = os.path.join(REPO, "tests", "goldens", "surface_singlescat.npz")


def main():
    from archnemesis.Surface_0 import calc_Hapke_BRDF, calc_OrenNayar_BRDF
    from archnemesis.ForwardModel_0 import calc_singlescatt_plane_spectrum

    rng = np.random.default_rng(11)
    nwave, ntheta = 6, 7
    wave = np.linspace(800.0, 1200.0, nwave)

    sol = np.array([0.0, 20.0, 45.0, 70.0, 45.0, 30.0, 85.0])
    emi = np.array([10.0, 35.0, 45.0, 20.0, 80.0, 30.0, 5.0])
    azi = np.array([0.0, 60.0, 120.0, 180.0, 90.0, 30.0, 150.0])

    # Hapke parameters per wave
    w = rng.uniform(0.3, 0.9, nwave)
    k = np.full(nwave, 1.0)
    bs0 = rng.uniform(0.2, 1.5, nwave)
    hs = rng.uniform(0.03, 0.2, nwave)
    bc0 = rng.uniform(0.0, 0.6, nwave)
    hc = rng.uniform(0.05, 0.3, nwave)
    rough = rng.uniform(0.0, 30.0, nwave)
    g1 = rng.uniform(0.1, 0.7, nwave)
    g2 = rng.uniform(-0.6, -0.1, nwave)
    f = rng.uniform(0.3, 0.9, nwave)
    hapke = calc_Hapke_BRDF(w, k, bs0, hs, bc0, hc, rough, g1, g2, f,
                            sol, emi, azi)

    alb = rng.uniform(0.1, 0.8, nwave)
    on_rough = rng.uniform(0.0, 40.0, nwave)
    oren = calc_OrenNayar_BRDF(alb, on_rough, sol, emi, azi)

    # single scattering kernel
    ng, nlayin = 3, 9
    tau = 10 ** rng.uniform(-3, 0.5, (nwave, ng, nlayin))
    emtemp = np.linspace(260.0, 160.0, nlayin)  # top->bottom along path
    omega = rng.uniform(0.0, 0.9, (nwave, ng, nlayin))
    phase = rng.uniform(0.01, 0.3, (nwave, nlayin))
    emissivity = rng.uniform(0.8, 1.0, nwave)
    brdf_path = rng.uniform(0.0, 0.3, nwave)
    solar = np.full(nwave, 3.0e-7)
    cases = {}
    for name, tsurf in {"nosurf": -1.0, "surf": 290.0}.items():
        cases[f"SS_{name}"] = calc_singlescatt_plane_spectrum(
            0, wave, tau, emtemp, omega, phase, tsurf, emissivity,
            brdf_path, solar, 35.0, 20.0,
        )

    np.savez(
        OUT,
        WAVE=wave, SOL=sol, EMI=emi, AZI=azi,
        W=w, K=k, BS0=bs0, HS=hs, BC0=bc0, HC=hc, ROUGH=rough,
        G1=g1, G2=g2, F=f, HAPKE=hapke,
        ALB=alb, ON_ROUGH=on_rough, OREN=oren,
        TAU=tau, EMTEMP=emtemp, OMEGA=omega, PHASE=phase,
        EMISSIVITY=emissivity, BRDF_PATH=brdf_path, SOLAR=solar,
        **cases,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
