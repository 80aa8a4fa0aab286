"""Chi-factor / special lineshapes vs the reference implementations.

Covers the full reference lineshape inventory (lineshape/__init__.py:6-11):
voigt + gaussian + lorentz are exercised elsewhere (test_lbl.py); here the
CO2 sub-Lorentz Tonkov+96 chi-factor (Venus windows), the Hartmann (2002)
CH4-in-H2 empirical wings, and the scaled CH4-H2 Voigt variant, evaluated
over the same (delta, alpha_d, gamma_l) ranges the LBL kernels see —
including the chi-factor breakpoints at 3/26/60/150/300 cm-1.
"""

import numpy as np
import pytest

from archnemesis_tpu.ops import voigt as v

REF_DIR = "/root/reference"


def _ref_lineshapes():
    import sys

    sys.path.insert(0, "tools/numba_stub")
    sys.path.insert(0, REF_DIR)
    from archnemesis import lineshape

    return lineshape


DELTAS = np.concatenate(
    [
        np.linspace(-400.0, 400.0, 801),
        np.array([-300.0, -150.0, -60.0, -26.0, -3.0, 3.0, 26.0, 60.0,
                  150.0, 300.0]),
        np.array([2.999, 3.001, 149.99, 150.01, 299.9, 300.1, 25.99, 26.01,
                  59.99, 60.01]),
    ]
)


@pytest.mark.parametrize(
    "ours,ref_name",
    [
        (v.tonkov96_sublorentz_co2_venus, "tonkov96_sublorentz_CO2_venus"),
        (v.hartmann_ch4_h2,
         "hartmann_empirical_infrared_CH4_H2_broadening"),
        (v.voigt_ch4_h2, "voigt_CH4_H2_broadening"),
    ],
)
@pytest.mark.parametrize("alpha,gamma", [(0.02, 0.08), (0.005, 0.5), (0.1, 0.01)])
def test_lineshape_matches_reference(ours, ref_name, alpha, gamma):
    ref = getattr(_ref_lineshapes(), ref_name)
    want = ref(DELTAS.copy(), alpha, gamma)
    got = np.asarray(ours(DELTAS, alpha, gamma))
    # rtol floor: the Weideman-24 Horner evaluation order differs slightly
    # between jnp and the reference's complex arithmetic in the far wings
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-30)


def test_registry_complete():
    assert set(v.LINESHAPES) == {
        "voigt", "gaussian", "lorentz",
        "tonkov96_sublorentz_co2_venus", "hartmann_ch4_h2", "voigt_ch4_h2",
    }


def test_lbl_cross_section_accepts_chi_lineshape():
    """The runtime-LBL engine accepts the chi-factor shapes end-to-end and
    sub-Lorentz wings reduce the far-wing opacity vs plain Voigt."""
    from archnemesis_tpu.io.linedata import read_lls_runtime

    rt = read_lls_runtime("tests/fixtures/co_runtime/cirstest.lls")
    rt = rt.windowed(float(rt.wave.min()), float(rt.wave.max()))
    from archnemesis_tpu.ops.lbl import lbl_cross_section

    t = np.array([180.0, 220.0])
    p = np.array([1.0e-4, 1.0e-3])
    amb = np.array([0.95, 0.95])
    k_voigt = np.asarray(
        lbl_cross_section(rt.line_lists[0], rt.blocks[0], t, p, amb,
                          lineshape="voigt", use_pallas=False)
    )
    k_chi = np.asarray(
        lbl_cross_section(rt.line_lists[0], rt.blocks[0], t, p, amb,
                          lineshape="hartmann_ch4_h2", use_pallas=False)
    )
    assert np.isfinite(k_chi).all()
    # near line cores (within 26 cm-1) chi=1 -> identical; the grids here
    # are narrow so totals stay close but not above voigt
    assert (k_chi <= k_voigt * (1 + 1e-12)).all()
    assert k_chi.max() > 0
