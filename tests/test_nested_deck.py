"""Deck-level nested sampling (r4 VERDICT item 8): retrieval_method=1 on
the reduced Jupiter CIRS deck.

Two layers of evidence:
1. the full 41-dim problem END-TO-END through the retrieval_nemesis
   dispatch (reference Retrievals.py:298-307 -> coreretNS) with a
   capped iteration budget — the wiring test;
2. posterior QUALITY on a reduced 6-parameter version of the same deck
   (the other prior sigmas collapsed below run_setup_ns's sigma_floor,
   so NS samples only the varied subspace): every NS posterior mean
   must land within ~2 sigma of the OE posterior, and the NS
   max-likelihood chi-square within 3x of OE's.
"""

import dataclasses
import shutil

import numpy as np
import pytest

DECK = "tests/fixtures/jupiter_fdret"
RUN = "cirstest"


@pytest.mark.slow
def test_ns_driver_dispatch(tmp_path):
    """retrieval_method=1 through the driver on the full deck (capped
    budget: wiring + output-contract coverage, not converged evidence)."""
    from archnemesis_tpu.retrievals import retrieval_nemesis

    deck_dir = tmp_path / "deck"
    shutil.copytree(DECK, deck_dir)
    shutil.copytree("tests/fixtures/ktables", tmp_path / "ktables")

    ns = retrieval_nemesis(
        str(deck_dir), RUN, retrieval_method=1, write_outputs=False,
        ns_kwargs=dict(n_live=24, evidence_tolerance=5.0, seed=2,
                       batch=24, max_iter=120),
    )
    assert np.isfinite(ns.logz)
    assert ns.samples.ndim == 2
    assert np.isfinite(ns.samples).all()
    assert np.isfinite(ns.means).all()
    assert ns.n_like >= 24


@pytest.mark.slow
def test_ns_posterior_vs_oe_reduced(tmp_path):
    import jax.numpy as jnp

    from archnemesis_tpu.retrieval.nested import run_setup_ns
    from archnemesis_tpu.retrieval.oe import coreret_oe
    from archnemesis_tpu.retrievals import make_retrieval_setup

    setup = make_retrieval_setup(DECK, RUN)
    sv = setup.sv
    nx = np.asarray(sv.xa).shape[0]
    # vary 6 spread-out temperature levels; pin the rest (prior sigma
    # below run_setup_ns's 1e-5 floor)
    vary = np.zeros(nx, bool)
    vary[:: max(nx // 6, 1)] = True
    sa = np.asarray(sv.sa).copy()
    keep = np.diag(sa).copy()
    sa[:] = np.diag(np.where(vary, keep, 1e-12))
    sv_red = dataclasses.replace(sv, sa=sa)
    setup = dataclasses.replace(setup, sv=sv_red)

    oe = coreret_oe(
        setup.forward_fn, jnp.asarray(sv_red.xa), jnp.asarray(sa),
        setup.y, setup.se, sv_red.lx, niter=4, philimit=0.1,
        verbose=False,
    )
    x_oe = np.asarray(oe.xn)
    s_oe = np.sqrt(np.diag(np.asarray(oe.st)))

    ns = run_setup_ns(setup, n_live=60, evidence_tolerance=0.5, seed=3,
                      batch=60)
    assert np.isfinite(ns.logz)

    sig = np.sqrt(np.diag(sa))
    tol = 2.0 * np.maximum(s_oe, sig)
    err = np.abs(ns.means - x_oe)
    assert np.all(err[vary] < tol[vary]), (
        err[vary], tol[vary],
    )

    y = np.asarray(setup.y)
    inv_e2 = 1.0 / np.diag(np.asarray(setup.se))

    def chi2(x):
        yn = np.asarray(setup.forward_fn(jnp.asarray(x)))
        return float(np.sum((yn - y) ** 2 * inv_e2))

    best = ns.samples[np.argmax(np.asarray(ns.logl))]
    assert chi2(best) < 3.0 * chi2(x_oe) + 1e-6
