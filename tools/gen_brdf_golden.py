"""Oracle goldens for BRDF surfaces inside the RT drivers: the reference
run on the Jupiter angled scattering deck with a synthetic surface patched
in (the deck itself is a gas giant; both implementations get the identical
surgery), covering

  A. multiple scattering + Lambert lower boundary (LOWBC=1, galb=0.3)
     (reference scloud11wave:5099 calc_brdf_matrix Lambertian branch)
  B. multiple scattering + Hapke lower boundary (LOWBC=2, .hap-style params)
     (calc_brdf_matrix:5168 anisotropic branch)
  C. single scattering + Hapke surface (calc_BRDF:949 inside
     calculate_single_scattering_plane_parallel_spectrum:4307)
  D. single scattering + Oren-Nayar surface (calc_BRDF:969)

-> tests/goldens/jupiter_brdf_fm.npz.  Multi-scatter + Oren-Nayar is NOT
generated: the reference calc_brdf_matrix only implements LAMBERTIAN and
HAPKE (ForwardModel_0.py:5203), so LOWBC=3 yields a zero BRDF matrix there.

Run: python tools/gen_brdf_golden.py (pure-Python oracle, slow).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

FIXTURES = os.path.join(REPO, "tests", "fixtures")
GOLDENS = os.path.join(REPO, "tests", "goldens")

TSURF = 300.0
EMISS = 0.8
GALB = 0.3
VEM = np.array([0.0, 1.0e6])
HAPKE = dict(SGLALB=0.6, K=1.0, BS0=0.5, hs=0.05, BC0=0.3, hc=0.1,
             ROUGHNESS=15.0, G1=0.25, G2=-0.3, F=0.7)
ON_ALB = 0.4
ON_ROUGH = 20.0


def patch_surface(Surface, lowbc):
    from archnemesis.enum import LowerBoundaryConditionEnum

    Surface.GASGIANT = False
    Surface.TSURF = TSURF
    Surface.NEM = 2
    Surface.VEM = VEM.copy()
    Surface.EMISSIVITY = np.full(2, EMISS)
    Surface.GALB = GALB
    Surface.LOWBC = LowerBoundaryConditionEnum(lowbc)
    if lowbc == 2:
        for k, v in HAPKE.items():
            setattr(Surface, k, np.full(2, v))
    if lowbc == 3:
        Surface.ALBEDO = np.full(2, ON_ALB)
        Surface.ROUGHNESS = np.full(2, ON_ROUGH)
    return Surface


def run_case(lowbc, iscat):
    deck = os.path.join(FIXTURES, "jupiter_scatter")
    cwd = os.getcwd()
    os.chdir(deck)
    try:
        (Atmosphere, Measurement, Spectroscopy, Scatter, Stellar, Surface,
         CIA, Layer, Variables, Retrieval) = ans.Files.read_input_files(
            "cirstest"
        )
        from archnemesis.enum import ScatteringCalculationModeEnum

        Scatter.ISCAT = ScatteringCalculationModeEnum(iscat)
        patch_surface(Surface, lowbc)
        fm = ans.ForwardModel_0(
            runname="cirstest", Atmosphere=Atmosphere, Surface=Surface,
            Measurement=Measurement, Spectroscopy=Spectroscopy,
            Stellar=Stellar, Scatter=Scatter, CIA=CIA, Layer=Layer,
            Variables=Variables,
        )
        fm.subprofretg = lambda: None  # raw deck profiles (as scatter golden)
        SPECONV = fm.nemesisfm()
        return np.asarray(SPECONV), np.asarray(fm.SpectroscopyX.WAVE), \
            Measurement.VCONV, Measurement.NCONV
    finally:
        os.chdir(cwd)


def main():
    from archnemesis.enum import ScatteringCalculationModeEnum as S

    multi = int(S.MULTIPLE_SCATTERING)
    single = int(S.SINGLE_SCATTERING_PLANE_PARALLEL)
    out = {}
    for key, lowbc, iscat in [
        ("ms_lambert", 1, multi),
        ("ms_hapke", 2, multi),
        ("ss_hapke", 2, single),
        ("ss_orennayar", 3, single),
    ]:
        spec, wave, vconv, nconv = run_case(lowbc, iscat)
        out[key] = spec
        out["WAVE"], out["VCONV"], out["NCONV"] = wave, vconv, nconv
        print(key, "done", spec.shape, spec[:3, 0])
    out.update(
        TSURF=TSURF, EMISS=EMISS, GALB=GALB, VEM=VEM,
        ON_ALB=ON_ALB, ON_ROUGH=ON_ROUGH,
        **{f"HAPKE_{k}": v for k, v in HAPKE.items()},
    )
    path = os.path.join(GOLDENS, "jupiter_brdf_fm.npz")
    np.savez(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
