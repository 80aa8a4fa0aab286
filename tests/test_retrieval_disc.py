"""Disc-averaged retrieval-driver parity (reference nemesisdiscfm
ForwardModel_0.py:1609 + calc_avepoints_exoplanet Measurement_0.py:1680):
the quadrature rays run as one vmapped batch and the weighted average is
differentiable.

Golden (tests/goldens/jupiter_disc_fm.npz, tools/gen_disc_retrieval_golden
.py): the reference nemesisdiscfm on the Jupiter nadir deck at nmu=3,
phase=0 — the exact configuration built here."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.retrievals import make_retrieval_setup_disc

DECK = "tests/fixtures/jupiter_nadir"
GOLDEN = "tests/goldens/jupiter_disc_fm.npz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="jupiter_disc_fm golden not generated"
)


@pytest.fixture(scope="module")
def setup():
    return make_retrieval_setup_disc(DECK, "cirstest", nmu=3)


def test_disc_forward_matches_reference(setup):
    """Disc-averaged spectrum vs the reference nemesisdiscfm oracle."""
    d = np.load(GOLDEN)
    y_disc = np.asarray(setup.forward_fn(jnp.asarray(setup.sv.xa)))
    want = d["SPECONV"]
    np.testing.assert_allclose(
        y_disc, want, rtol=1e-5, atol=np.abs(want).max() * 1e-8
    )


def test_disc_jacfwd(setup):
    kk = np.asarray(jax.jacfwd(setup.forward_fn)(jnp.asarray(setup.sv.xa)))
    assert np.all(np.isfinite(kk))
    assert np.all(np.abs(kk).max(axis=0) > 0.0)
