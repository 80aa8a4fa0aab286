"""Disc-averaged retrieval-driver wiring (reference nemesisdiscfm +
calc_avepoints_exoplanet): the quadrature rays run as one vmapped batch
and the weighted average is differentiable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.retrievals import make_retrieval_setup, make_retrieval_setup_disc

DECK = "tests/fixtures/jupiter_nadir"


@pytest.fixture(scope="module")
def setup():
    return make_retrieval_setup_disc(DECK, "cirstest", nmu=3)


def test_disc_average_bounded_by_nadir(setup):
    """The disc average of thermal radiance lies between the warmest and
    coldest single-ray spectra; compare against the plain nadir driver."""
    y_disc = np.asarray(setup.forward_fn(jnp.asarray(setup.sv.xa)))
    assert np.all(np.isfinite(y_disc)) and np.all(y_disc > 0)

    nadir = make_retrieval_setup(DECK, "cirstest")
    y_nadir = np.asarray(nadir.forward_fn(jnp.asarray(nadir.sv.xa)))
    # limb darkening: disc average is below the nadir-ray radiance but
    # within a factor ~2 for a smooth thermal spectrum
    assert np.all(y_disc <= y_nadir * 1.05)
    assert np.all(y_disc >= y_nadir * 0.3)


def test_disc_jacfwd(setup):
    kk = np.asarray(jax.jacfwd(setup.forward_fn)(jnp.asarray(setup.sv.xa)))
    assert np.all(np.isfinite(kk))
    assert np.all(np.abs(kk).max(axis=0) > 0.0)
