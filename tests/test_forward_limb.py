"""Limb thermal-emission forward model + retrieval driver vs the reference.

Golden (tests/goldens/jupiter_limb_fm.npz, tools/gen_limb_golden.py): the
reference nemesisLfm (ForwardModel_0.py:1254 + calc_path_L :3375) on a
limb variant of the Jupiter CIRS deck — three tangent heights, correlated-k
tables, FWHM=0 channel interpolation. Covers: one-layering-for-all-tangent-
heights batching, limb thermal-emission paths, tangent-height interpolation
to measured TANHE, and the make_retrieval_setup_limb / nemesis_l driver.
"""

import os

import numpy as np
import pytest

DECK = "tests/fixtures/jupiter_limb"
GOLDEN = "tests/goldens/jupiter_limb_fm.npz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="jupiter_limb golden not generated"
)


@pytest.fixture(scope="module")
def setup():
    from archnemesis_tpu.retrievals import make_retrieval_setup_limb

    d = np.load(GOLDEN)
    s = make_retrieval_setup_limb(DECK, "cirstest")
    return d, s


def test_forward_matches_reference(setup):
    d, s = setup
    y = np.asarray(s.forward_fn(s.sv.xa))
    ngeom = len(d["TANHE"])
    golden = np.asarray(d["SPECONV"])  # (NCONV, NGEOM)
    got = y.reshape(ngeom, -1).T
    np.testing.assert_allclose(got, golden, rtol=2e-5,
                               atol=np.median(np.abs(golden)) * 1e-6)


def test_measurement_vector_is_oracle_spectrum(setup):
    # the fixture's .spx measured column was written from the oracle
    d, s = setup
    golden = np.asarray(d["SPECONV"]).T.ravel()
    np.testing.assert_allclose(np.asarray(s.y), golden, rtol=2e-5)


def test_jacobian_finite_difference(setup):
    """jacfwd through the limb batch matches central differences."""
    import jax

    _, s = setup
    xa = np.asarray(s.sv.xa)
    f = jax.jit(s.forward_fn)
    k = jax.jit(jax.jacfwd(s.forward_fn))(s.sv.xa)
    rng = np.random.default_rng(0)
    for j in rng.choice(xa.size, size=min(3, xa.size), replace=False):
        h = 1e-4 * max(1.0, abs(xa[j]))
        xp, xm = xa.copy(), xa.copy()
        xp[j] += h
        xm[j] -= h
        fd = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * h)
        np.testing.assert_allclose(
            np.asarray(k)[:, j], fd,
            rtol=5e-3, atol=np.abs(fd).max() * 5e-3 + 1e-12,
        )


def test_limb_driver_dispatch(tmp_path):
    """retrieval_nemesis(nemesis_l=True) runs one OE iteration end-to-end."""
    import shutil

    from archnemesis_tpu.retrievals import retrieval_nemesis

    base = tmp_path / "deck"
    shutil.copytree(DECK, base)
    shutil.copytree("tests/fixtures/ktables", tmp_path / "ktables")
    res = retrieval_nemesis(str(base), "cirstest", niter=1,
                            nemesis_l=True, write_outputs=False)
    assert np.all(np.isfinite(np.asarray(res.yn)))
    assert res.phi_history[-1] <= res.phi_history[0]
