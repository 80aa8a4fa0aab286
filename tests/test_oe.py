"""Optimal-estimation step math vs the reference oracle.

Golden (tests/goldens/jupiter_oe.npz, tools/gen_oe_golden.py): the reference
OptimalEstimation_0 gain matrix / cost / next-state quantities on the Jupiter
nadir deck, with the reference's own analytic Jacobian KK and forward
spectrum YN. This isolates the Rodgers/LM algebra (oe.py) from the forward
model, which is covered by test_forward_nadir.
"""

import numpy as np
import pytest

from archnemesis_tpu.retrieval.oe import (
    calc_gain_matrix,
    calc_next_xn,
    calc_phi,
    calc_serr,
)

GOLDEN = "tests/goldens/jupiter_oe.npz"


@pytest.fixture(scope="module")
def d():
    return np.load(GOLDEN)


def test_gain_matrix(d):
    dd, aa = calc_gain_matrix(d["KK"], d["SA"], d["SE"])
    np.testing.assert_allclose(np.asarray(dd), d["DD"], rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(aa), d["AA"], rtol=1e-6, atol=1e-12)


def test_phi(d):
    phi, chisq = calc_phi(d["Y"], d["YN"], d["XN"], d["XA"], d["SE"], d["SA"])
    np.testing.assert_allclose(float(phi), float(d["PHI"]), rtol=1e-8)
    np.testing.assert_allclose(float(chisq), float(d["CHISQ"]), rtol=1e-8)


def test_next_xn(d):
    x = calc_next_xn(d["XA"], d["XN"], d["Y"], d["YN"], d["DD"], d["AA"])
    np.testing.assert_allclose(np.asarray(x), d["X_OUT"], rtol=1e-6, atol=1e-10)


def test_serr_shapes(d):
    sm, sn, st = calc_serr(d["DD"], d["AA"], d["SE"], d["SA"])
    nx = d["XA"].shape[0]
    assert np.asarray(sm).shape == (nx, nx)
    np.testing.assert_allclose(np.asarray(st), np.asarray(sm) + np.asarray(sn))
    # total error is a covariance: symmetric positive semi-definite-ish
    np.testing.assert_allclose(np.asarray(st), np.asarray(st).T, rtol=1e-8)
