"""Golden for the ACS-MIR double-Gaussian ILS models (228/229/230).

Runs the reference Model228/Model229/Model230.calculate on a synthetic
Measurement (building NFIL/VFIL/AFIL sampled filters), then the reference
lblconv_fil numba kernel on a synthetic spectrum. The TPU framework evaluates
the Gaussians directly on the calc grid (ops/convolution.py
double_gauss_ils_weights) — the exact limit of the reference's
sample-then-linear-interp — so parity is at interp accuracy (~1e-4).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.refutils import import_reference  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "ils_models.npz")


def main():
    ans = import_reference()
    from archnemesis.Models import Models

    nconv = 40
    vconv = np.linspace(2380.0, 2400.0, nconv)
    wave = np.linspace(2375.0, 2405.0, 4000)
    rng = np.random.default_rng(7)
    spec = 1.0 + 0.3 * np.sin(wave / 3.1) + 0.1 * rng.standard_normal(wave.size)

    meas = ans.Measurement_0(runname="ils", NGEOM=1, FWHM=-1.0)
    meas.NCONV = np.array([nconv])
    meas.VCONV = vconv[:, None].copy()

    # model 229: A0 A1 A2 DELDG FWHM AMP_LO AMP_HI
    p229 = (0.005, -0.003, 0.004, 0.15, 0.12, 0.25, 0.35)
    m229 = Models[229].calculate(meas, *p229)
    from archnemesis.Measurement_0 import lblconv_fil

    y229 = lblconv_fil(wave.size, wave, spec, nconv, vconv,
                       m229.NFIL, m229.VFIL, m229.AFIL)

    # model 228: V0 C0 C1 C2 P0 P1 P2 P3 (also rebuilds VCONV)
    meas2 = ans.Measurement_0(runname="ils", NGEOM=1, FWHM=-1.0)
    meas2.NCONV = np.array([nconv])
    meas2.VCONV = vconv[:, None].copy()
    p228 = (2380.0, 0.5, 1e-4, -2e-6, 0.15, 0.12, 0.25, 0.35)
    spectro = None
    m228, _ = Models[228].calculate(meas2, spectro, *p228)
    vconv228 = m228.VCONV[:nconv, 0].copy()
    y228 = lblconv_fil(wave.size, wave, spec, nconv, vconv228,
                       m228.NFIL, m228.VFIL, m228.AFIL)

    # model 230: two windows, 7 params each
    meas3 = ans.Measurement_0(runname="ils", NGEOM=1, FWHM=-1.0)
    meas3.NCONV = np.array([nconv])
    meas3.VCONV = vconv[:, None].copy()
    liml = np.array([2380.0, 2390.0])
    limh = np.array([2390.0, 2400.5])
    par230 = np.array([
        [0.005, -0.002],
        [-0.003, 0.001],
        [0.004, -0.004],
        [0.15, 0.18],
        [0.12, 0.10],
        [0.25, 0.30],
        [0.35, 0.28],
    ])
    m230 = Models[230].calculate(meas3, 2, liml, limh, par230)
    y230 = lblconv_fil(wave.size, wave, spec, nconv, vconv,
                       m230.NFIL, m230.VFIL, m230.AFIL)

    np.savez(
        OUT, WAVE=wave, SPEC=spec, VCONV=vconv,
        P229=np.array(p229), Y229=y229,
        P228=np.array(p228), Y228=y228, VCONV228=vconv228,
        LIML=liml, LIMH=limh, PAR230=par230, Y230=y230,
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
