"""Titan FOV-averaged forward model vs the reference: mixed nadir + limb
field-of-view points, LBL tables, non-gasgiant surface, SVP file, Gaussian
ILS with FWHM>0.

Golden (tests/goldens/titan_fov_fm.npz, tools/gen_titan_fixture.py): the
reference nemesisfm on a truncated Titan CH3CN deck (8 FOV points of the
original 35, 200 channels) with a synthetic .lta table. The limb FOV
points run as one vmapped tangent-height batch in our pipeline.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.retrievals import make_retrieval_setup

DECK = "tests/fixtures/titan_fov"
GOLDEN = "tests/goldens/titan_fov_fm.npz"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    s = make_retrieval_setup(DECK, "ch3cn")
    return d, s


def test_apriori(setup):
    d, s = setup
    np.testing.assert_allclose(s.sv.xa, d["XA"], rtol=1e-10)


def test_fov_averaged_spectrum(setup):
    d, s = setup
    yn = np.asarray(s.forward_fn(jnp.asarray(s.sv.xa)))
    nconv = int(d["NCONV"][0])
    want = d["SPECONV"][:nconv, 0]
    np.testing.assert_allclose(yn, want, rtol=1e-5, atol=0)
