"""Retrieval-driver wiring for scattering decks: make_retrieval_setup on the
Jupiter multiple-scattering deck (ISCAT=1) builds a differentiable forward
function through the adding-doubling core and the .apr models (47 cloud,
444 retrieved Mie optics), replacing the reference's forced numeric
Jacobian for scattering runs (ForwardModel_0.py:2251-2252).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.retrievals import make_retrieval_setup

DECK = "tests/fixtures/jupiter_scatter"


@pytest.fixture(scope="module")
def setup():
    return make_retrieval_setup(DECK, "cirstest")


def test_forward_finite_and_shaped(setup):
    y0 = np.asarray(setup.forward_fn(jnp.asarray(setup.sv.xa)))
    assert y0.shape == setup.y.shape
    assert np.all(np.isfinite(y0))
    assert np.all(y0 > 0.0)  # solar-reflected radiance


def test_jacfwd_through_scattering(setup):
    kk = np.asarray(
        jax.jacfwd(setup.forward_fn)(jnp.asarray(setup.sv.xa))
    )
    assert kk.shape == (setup.y.size, setup.sv.nx)
    assert np.all(np.isfinite(kk))
    # every retrieved variable must influence the spectrum somewhere
    assert np.all(np.abs(kk).max(axis=0) > 0.0)
