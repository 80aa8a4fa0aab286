"""Transit retrieval-driver wiring (reference retrieval_nemesis with
NemesisPT=True -> nemesisPTfm): transit-depth forward function with
hydrostatic rebalance inside the differentiated path, and analytic
Jacobians where the reference must perturb numerically."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.enums import SpectraUnit
from archnemesis_tpu.retrievals import make_retrieval_setup_transit

DECK = "tests/fixtures/mars_so"


@pytest.fixture(scope="module")
def setup():
    # the mars deck is an SO run (IFORM=transmission); flip it to a
    # transit configuration the way the reference nemesisPT runs do
    import h5py
    import shutil
    import tempfile
    import os

    d = tempfile.mkdtemp()
    for ext in (".h5", ".apr"):
        shutil.copy(f"{DECK}/mars_solocc{ext}", d)
    # retarget table LOCATION (relative paths resolve against the deck dir)
    with h5py.File(os.path.join(d, "mars_solocc.h5"), "a") as f:
        locs = [x.decode() if isinstance(x, bytes) else str(x)
                for x in f["Spectroscopy/LOCATION"][()]]
        locs = [x if os.path.isabs(x) else os.path.abspath(
            os.path.join(DECK, x)) for x in locs]
        del f["Spectroscopy/LOCATION"]
        f["Spectroscopy/LOCATION"] = np.asarray([s.encode() for s in locs])
        f["Measurement/IFORM"][...] = int(SpectraUnit.TransitDepth)
        if "Stellar" not in f:
            g = f.create_group("Stellar")
            g["SOLEXIST"] = True
            g["DIST"] = 1.5
            g["RADIUS"] = 6.957e5  # km (reference Stellar_0 stores km)
            g["ISPACE"] = 0
            g["WAVE"] = np.linspace(3000.0, 4000.0, 32)
            g["SOLSPEC"] = np.full(32, 1.0e20)
    return make_retrieval_setup_transit(d, "mars_solocc")


def test_forward_is_transit_depth(setup):
    y0 = np.asarray(setup.forward_fn(jnp.asarray(setup.sv.xa)))
    assert y0.shape == setup.y.shape
    assert np.all(np.isfinite(y0))
    # percent of stellar disc: tiny positive for Mars-sized planet
    assert np.all(y0 > 0.0) and np.all(y0 < 100.0)


def test_jacfwd_through_hydrostatics(setup):
    kk = np.asarray(jax.jacfwd(setup.forward_fn)(jnp.asarray(setup.sv.xa)))
    assert np.all(np.isfinite(kk))
    assert np.all(np.abs(kk).max(axis=0) > 0.0)
