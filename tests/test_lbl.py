"""Runtime line-by-line opacity vs the reference oracle.

Golden (tests/goldens/co_lbl.npz, tools/gen_lbl_golden.py) is the reference
LineData_0.add_monochromatic_absorption with the Weideman-24 Voigt on the CO
line list bundled with the reference test data, at three (T, P, amb_frac)
conditions. Both sides use the same published Weideman coefficients, so the
parity target is machine precision in float64.
"""

import numpy as np
import pytest

from archnemesis_tpu.io.linedata import read_ans_linedata
from archnemesis_tpu.ops.lbl import build_blocks, lbl_cross_section

GOLDEN = "tests/goldens/co_lbl.npz"
LINE_H5 = "tests/fixtures/linedata/CO_1_ambient_AIR.h5"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    ll = read_ans_linedata(LINE_H5, gas_id=5, iso_id=1)
    blocks = build_blocks(d["WAVE"], ll.nu)
    return d, ll, blocks


def test_line_list(setup):
    _, ll, _ = setup
    assert ll.n_lines > 1000
    assert np.all(np.diff(ll.nu) >= 0)


def test_lbl_cross_section_matches_reference(setup):
    d, ll, blocks = setup
    cases = d["CASES"]  # (NCASE, 3) rows of (T, P[atm], amb_frac)
    k = np.asarray(
        lbl_cross_section(ll, blocks, cases[:, 0], cases[:, 1], cases[:, 2])
    )  # (NWAVE, NCASE)
    want = d["K"]
    assert k.shape == want.shape
    np.testing.assert_allclose(k, want, rtol=1e-12, atol=0)


def test_block_width_invariance(setup):
    """The static blocking is an implementation detail: changing the block
    width must not change the spectrum."""
    d, ll, _ = setup
    wave = d["WAVE"][:1000]
    blocks_a = build_blocks(wave, ll.nu, block_width=128)
    blocks_b = build_blocks(wave, ll.nu, block_width=200)
    t = np.array([200.0])
    p = np.array([0.3])
    amb = np.array([0.9])
    ka = np.asarray(lbl_cross_section(ll, blocks_a, t, p, amb))
    kb = np.asarray(lbl_cross_section(ll, blocks_b, t, p, amb))
    np.testing.assert_allclose(ka, kb, rtol=1e-12, atol=0)
