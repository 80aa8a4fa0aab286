"""SO retrieval-driver wiring (reference retrieval_nemesis with
NemesisSO=True -> nemesisSOfm): setup on the Mars solar-occultation HDF5
deck builds a differentiable transmission forward function batched over all
tangent heights, and one OE step moves phi downhill.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.retrievals import make_retrieval_setup_so

DECK = "tests/fixtures/mars_so"


@pytest.fixture(scope="module")
def setup():
    return make_retrieval_setup_so(DECK, "mars_solocc")


def test_forward_finite_and_shaped(setup):
    y0 = np.asarray(setup.forward_fn(jnp.asarray(setup.sv.xa)))
    assert y0.shape == setup.y.shape
    assert np.all(np.isfinite(y0))
    # transmissions
    assert y0.min() >= 0.0 and y0.max() <= 1.0 + 1e-10


def test_jacfwd_and_oe_step(setup):
    from archnemesis_tpu.retrieval.oe import coreret_oe

    kk = np.asarray(jax.jacfwd(setup.forward_fn)(jnp.asarray(setup.sv.xa)))
    assert kk.shape == (setup.y.size, setup.sv.nx)
    assert np.all(np.isfinite(kk))
    assert np.all(np.abs(kk).max(axis=0) > 0.0)

    res = coreret_oe(
        setup.forward_fn, setup.sv.xa, setup.sv.sa, setup.y, setup.se,
        setup.sv.lx, niter=1, philimit=0.1,
    )
    assert np.isfinite(res.phi)


def test_output_hdf5_roundtrip(setup, tmp_path):
    """/Retrieval output group written and read back (reference
    write_output_hdf5, OptimalEstimation_0.py:288)."""
    import shutil

    from archnemesis_tpu.retrieval.oe import coreret_oe
    from archnemesis_tpu.retrieval.output import (
        read_output_hdf5,
        write_output_hdf5,
    )

    res = coreret_oe(
        setup.forward_fn, setup.sv.xa, setup.sv.sa, setup.y, setup.se,
        setup.sv.lx, niter=0, philimit=0.1,
    )
    p = str(tmp_path / "run.h5")
    shutil.copy(f"{DECK}/mars_solocc.h5", p)
    write_output_hdf5(p, setup, res)
    out = read_output_hdf5(p)
    np.testing.assert_allclose(out["xn"], res.xn)
    np.testing.assert_allclose(out["yn"], res.yn)
    np.testing.assert_allclose(out["y"], setup.y)
    assert out["nvar"] == len(setup.sv.entries)
    # unlogged parameters: log-flagged entries come back as exp(x)
    assert np.all(out["aprparam"] >= 0.0)
