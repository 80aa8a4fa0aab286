"""Pallas LBL kernel vs the XLA reference path (interpreter mode on CPU).

The Pallas kernel computes the layer line physics (strength scaling, Doppler/
Lorentz widths, pressure shift) inside VMEM from static per-line parameters;
the XLA path gathers (layer, block, line) panels. Both must produce the same
cross-sections, and jacfwd through the Pallas entry (custom JVP -> XLA
tangents) must match jacfwd through the XLA path.
"""

import jax
import numpy as np
import pytest

from archnemesis_tpu.io.linedata import read_ans_linedata
from archnemesis_tpu.ops.lbl import build_blocks, lbl_cross_section
from archnemesis_tpu.ops.lbl_pallas import lbl_cross_section_pallas

LINE_H5 = "tests/fixtures/linedata/CO_1_ambient_AIR.h5"


@pytest.fixture(scope="module")
def setup():
    ll = read_ans_linedata(LINE_H5, gas_id=5, iso_id=1)
    wave = np.linspace(2050.0, 2250.0, 700)
    blocks = build_blocks(wave, ll.nu)
    return ll, blocks


def test_pallas_matches_xla(setup):
    ll, blocks = setup
    t = np.array([120.0, 200.0, 290.0])
    p = np.array([1.0e-3, 0.3, 1.2])
    amb = np.array([0.99, 0.9, 0.5])
    k_xla = np.asarray(lbl_cross_section(ll, blocks, t, p, amb))
    k_pl = np.asarray(
        lbl_cross_section_pallas(ll, blocks, t, p, amb, interpret=True)
    )
    assert k_pl.shape == k_xla.shape
    np.testing.assert_allclose(k_pl, k_xla, rtol=1e-10, atol=0)


def test_pallas_jvp_delegates_to_xla(setup):
    ll, blocks = setup
    t = np.array([200.0])
    p = np.array([0.3])
    amb = np.array([0.9])

    def f_pl(tv):
        return lbl_cross_section_pallas(
            ll, blocks, tv, p, amb, interpret=True
        ).sum(axis=1)

    def f_xla(tv):
        return lbl_cross_section(ll, blocks, tv, p, amb).sum(axis=1)

    j_pl = np.asarray(jax.jacfwd(f_pl)(t))
    j_xla = np.asarray(jax.jacfwd(f_xla)(t))
    np.testing.assert_allclose(j_pl, j_xla, rtol=1e-10, atol=0)
