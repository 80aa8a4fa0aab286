"""Deck-level nested sampling (r4 VERDICT item 8): retrieval_method=1 on
a thinned copy of the reduced Jupiter CIRS deck, end-to-end through the
retrieval_nemesis dispatch (reference Retrievals.py:298-307 -> coreretNS).

The full 200-channel/40-layer fixture costs ~3 s per forward on this
2-vCPU box, so the deck is thinned in-place (first 32 channels, 16
layers — same pipeline, same file formats) and the posterior-quality
run varies a 3-parameter subspace (the rest of the prior collapsed
below run_setup_ns's sigma_floor): NS posterior means must land within
~2 sigma of the OE posterior and the NS max-likelihood chi-square
within 3x of OE's.
"""

import dataclasses
import re
import shutil

import numpy as np
import pytest

DECK = "tests/fixtures/jupiter_fdret"
RUN = "cirstest"
NCHAN = 32


def _thin_deck(tmp_path):
    deck_dir = tmp_path / "deck"
    shutil.copytree(DECK, deck_dir)
    shutil.copytree("tests/fixtures/ktables", tmp_path / "ktables")
    spx = deck_dir / f"{RUN}.spx"
    lines = spx.read_text().splitlines()
    # header: fwhm-line, ngeom-block with nconv + nav + angles, then
    # nconv channel rows
    nconv = int(float(lines[1].split()[0]))
    head, chans = lines[:4], lines[4:4 + nconv]
    head[1] = f"        {NCHAN}"
    spx.write_text("\n".join(head + chans[:NCHAN]) + "\n")
    st = (deck_dir / f"{RUN}.set").read_text()
    st = re.sub(r"(Number of atm layers :)\s*\d+", r"\1  16", st)
    (deck_dir / f"{RUN}.set").write_text(st)
    return str(deck_dir)


@pytest.mark.slow
def test_ns_deck_driver_and_posterior(tmp_path):
    import jax.numpy as jnp

    from archnemesis_tpu.retrieval.nested import run_setup_ns
    from archnemesis_tpu.retrieval.oe import coreret_oe
    from archnemesis_tpu.retrievals import (
        make_retrieval_setup,
        retrieval_nemesis,
    )

    deck_dir = _thin_deck(tmp_path)

    # 1. wiring: retrieval_method=1 end-to-end through the driver
    ns0 = retrieval_nemesis(
        deck_dir, RUN, retrieval_method=1, write_outputs=False,
        ns_kwargs=dict(n_live=16, evidence_tolerance=5.0, seed=2,
                       batch=16, max_iter=100),
    )
    assert np.isfinite(ns0.logz)
    assert ns0.samples.ndim == 2 and np.isfinite(ns0.samples).all()

    # 2. posterior quality on a 3-parameter subspace
    setup = make_retrieval_setup(deck_dir, RUN)
    sv = setup.sv
    nx = np.asarray(sv.xa).shape[0]
    vary = np.zeros(nx, bool)
    vary[[2, nx // 2, nx - 3]] = True
    sa = np.asarray(sv.sa).copy()
    keep = np.diag(sa).copy()
    sa[:] = np.diag(np.where(vary, keep, 1e-12))
    setup = dataclasses.replace(
        setup, sv=dataclasses.replace(sv, sa=sa)
    )

    oe = coreret_oe(
        setup.forward_fn, jnp.asarray(sv.xa), jnp.asarray(sa),
        setup.y, setup.se, sv.lx, niter=4, philimit=0.1, verbose=False,
    )
    x_oe = np.asarray(oe.xn)
    s_oe = np.sqrt(np.diag(np.asarray(oe.st)))

    ns = run_setup_ns(setup, n_live=30, evidence_tolerance=0.5, seed=3,
                      batch=30)
    assert np.isfinite(ns.logz)

    sig = np.sqrt(np.diag(sa))
    tol = 2.0 * np.maximum(s_oe, sig)
    err = np.abs(ns.means - x_oe)
    assert np.all(err[vary] < tol[vary]), (err[vary], tol[vary])

    y = np.asarray(setup.y)
    inv_e2 = 1.0 / np.diag(np.asarray(setup.se))

    def chi2(x):
        yn = np.asarray(setup.forward_fn(jnp.asarray(x)))
        return float(np.sum((yn - y) ** 2 * inv_e2))

    best = ns.samples[np.argmax(np.asarray(ns.logl))]
    assert chi2(best) < 3.0 * chi2(x_oe) + 1e-6
