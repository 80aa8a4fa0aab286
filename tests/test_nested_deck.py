"""Deck-level nested sampling (r4 VERDICT item 8): retrieval_method=1 on
the reduced Jupiter CIRS deck, end-to-end through the retrieval_nemesis
dispatch (reference Retrievals.py:298-307 -> coreretNS).

The NS posterior (few live points for CI speed) must land inside the OE
posterior: every varied-parameter posterior mean within ~2 sigma of the
OE solution, and the NS max-likelihood chi-square comparable to OE's.
"""

import shutil

import numpy as np
import pytest

DECK = "tests/fixtures/jupiter_fdret"
RUN = "cirstest"


@pytest.mark.slow
def test_ns_on_jupiter_deck(tmp_path):
    from archnemesis_tpu.retrievals import (
        make_retrieval_setup,
        retrieval_nemesis,
    )
    from archnemesis_tpu.retrieval.oe import coreret_oe

    deck_dir = tmp_path / "deck"
    shutil.copytree(DECK, deck_dir)
    shutil.copytree("tests/fixtures/ktables", tmp_path / "ktables")

    # OE baseline on the same setup (the trajectory this deck's other
    # tests validate against the FD-Jacobian oracle)
    setup = make_retrieval_setup(str(deck_dir), RUN)
    import jax.numpy as jnp

    oe = coreret_oe(
        setup.forward_fn, jnp.asarray(setup.sv.xa),
        jnp.asarray(setup.sv.sa), setup.y, setup.se,
        setup.sv.lx, niter=3, philimit=0.1, verbose=False,
    )
    x_oe = np.asarray(oe.xn)
    s_oe = np.sqrt(np.diag(np.asarray(oe.st)))

    # NS through the DRIVER dispatch (retrieval_method=1)
    ns = retrieval_nemesis(
        str(deck_dir), RUN, retrieval_method=1, write_outputs=False,
        ns_kwargs=dict(n_live=48, evidence_tolerance=1.0, seed=2,
                       batch=48),
    )
    assert np.isfinite(ns.logz)
    assert ns.samples.ndim == 2 and ns.samples.shape[1] == x_oe.shape[0]

    sig = np.sqrt(np.diag(np.asarray(setup.sv.sa)))
    vary = sig > 1e-5
    # posterior mean within max(2 sigma_OE, 2 sigma_prior) of the OE
    # solution per varied parameter (few-live-point NS is a coarse
    # posterior; the test pins the WIRING and gross statistics)
    tol = 2.0 * np.maximum(s_oe, sig)
    err = np.abs(ns.means - x_oe)
    assert np.all(err[vary] < tol[vary]), (
        f"NS mean outside 2 sigma of OE at "
        f"{np.nonzero(err > tol)[0].tolist()}"
    )

    # NS found a state with chi-square within 3x of the OE fit
    y = np.asarray(setup.y)
    inv_e2 = 1.0 / np.diag(np.asarray(setup.se))

    def chi2(x):
        yn = np.asarray(setup.forward_fn(jnp.asarray(x)))
        return float(np.sum((yn - y) ** 2 * inv_e2))

    best = ns.samples[np.argmax(np.asarray(ns.logl))]
    assert chi2(best) < 3.0 * chi2(x_oe) + 1e-6
