"""LIN retrieval chaining (.pre) + .itr checkpoint/resume.

Covers the reference's previous-retrieval machinery (Retrievals.py:171-290
LIN=1/2/3 semantics, OptimalEstimation write_raw:1043 / Files read_pre:1623
round trip, and OptimalEstimation_0.from_itr:55 resume). The forward model
and Jacobian are oracle-verified elsewhere (test_retrieval_e2e); here the
chaining plumbing is checked for self-consistency on the Jupiter deck.
"""

import os
import shutil

import numpy as np
import pytest

from archnemesis_tpu.retrieval import output as out_mod
from archnemesis_tpu.retrievals import make_retrieval_setup, retrieval_nemesis

# the reduced Jupiter deck (same physics/format, npro 41, 200 channels):
# chaining semantics are deck-independent and the full deck costs ~25 min
# of jacfwd wall-clock here
DECK = "tests/fixtures/jupiter_fdret"


@pytest.fixture(scope="module")
def chained_deck(tmp_path_factory):
    """Copy the deck, run a short retrieval, promote .raw -> .pre."""
    base = tmp_path_factory.mktemp("chain")
    dst = str(base / "deck")
    shutil.copytree(DECK, dst)
    # the deck's .kls points at ../ktables relative paths
    shutil.copytree("tests/fixtures/ktables", str(base / "ktables"))
    res0 = retrieval_nemesis(dst, "cirstest", niter=1, write_outputs=True)
    shutil.copyfile(
        os.path.join(dst, "cirstest.raw"), os.path.join(dst, "cirstest.pre")
    )
    return dst, res0


def test_raw_pre_roundtrip(chained_deck):
    dst, res0 = chained_deck
    prev = out_mod.read_raw(os.path.join(dst, "cirstest.pre"))
    s = make_retrieval_setup(dst, "cirstest")
    assert prev["nx"] == s.sv.nx
    np.testing.assert_allclose(prev["xn"], res0.xn, rtol=1e-7)
    np.testing.assert_allclose(prev["st"], res0.st, rtol=1e-6, atol=1e-30)
    assert prev["varidents"] == [e.varident for e in s.sv.entries]


def test_itr_roundtrip_and_resume(chained_deck):
    dst, res0 = chained_deck
    rec = out_mod.read_itr(os.path.join(dst, "cirstest.itr"))
    s = make_retrieval_setup(dst, "cirstest")
    assert rec["nx"] == s.sv.nx
    assert rec["ny"] == s.y.shape[0]
    # records are written at the START of each iteration (reference
    # coreretOE OptimalEstimation_0.py:1386-1396), so the niter=1 run's
    # single record holds the starting (a-priori) state at 4 sig digits
    np.testing.assert_allclose(rec["xn1"], s.sv.xa, rtol=2e-4)
    np.testing.assert_allclose(rec["y"], s.y, rtol=2e-4)

    # resume: starting from the checkpoint with zero iterations lands on
    # the checkpointed state
    res_r = retrieval_nemesis(
        dst, "cirstest", niter=0, write_outputs=False, resume=True
    )
    np.testing.assert_allclose(res_r.xn, rec["xn1"], rtol=1e-12)


def test_lin2_substitutes_apriori(chained_deck):
    """LIN=2: previous posterior becomes the new a-priori, so a 0-iteration
    run sits exactly at the previous retrieved state."""
    dst, res0 = chained_deck
    res2 = retrieval_nemesis(dst, "cirstest", lin=2, niter=0,
                             write_outputs=False)
    np.testing.assert_allclose(res2.xn, res0.xn, rtol=1e-7)


@pytest.mark.slow
def test_lin1_inflates_se_and_bakes_atmosphere(chained_deck):
    """LIN=1: the previous posterior folds through K_prev into SE
    (chisq drops vs an unchained run at the same state) and the base
    atmosphere carries the previous state.

    NOTE on yn: this deck's only variable is model 0 (continuous T), a
    *replace*-type parameterisation — the new retrieval's forward at xa
    overwrites the baked T again, so yn is identical to the unchained run.
    That matches the reference exactly (subprofretg also replaces,
    ForwardModel_0.py:2507; LIN=1 keeps FM_prev.AtmosphereX but the next
    subprofretg overwrites it, Retrievals.py:190-196). The baking is
    asserted on the base atmosphere instead.
    """
    from archnemesis_tpu.retrieval.statevector import apply_state
    from archnemesis_tpu.retrievals import (
        _match_prev_entries,
        _prev_subset_sv,
        make_retrieval_setup,
    )

    dst, res0 = chained_deck
    res_plain = retrieval_nemesis(dst, "cirstest", lin=0, niter=0,
                                  write_outputs=False)
    res1 = retrieval_nemesis(dst, "cirstest", lin=1, niter=0,
                             write_outputs=False)
    s = make_retrieval_setup(dst, "cirstest")
    # the baked base atmosphere carries the previous retrieved T (which
    # the niter=1 fixture run moved off the a-priori)
    prev = out_mod.read_raw(os.path.join(dst, "cirstest.pre"))
    assert not np.allclose(prev["xn"], s.sv.xa, rtol=1e-9)
    sub_sv = _prev_subset_sv(
        _match_prev_entries(s.sv, prev, s.deck.atmosphere), prev,
        s.deck.atmosphere,
    )
    atm_baked = apply_state(s.deck.atmosphere, prev["xn"], sub_sv)
    assert not np.allclose(
        np.asarray(atm_baked.t), np.asarray(s.deck.atmosphere.t), rtol=1e-9
    )
    # replace-type model: the forward at xa re-overwrites the baked T, so
    # yn is unchanged up to the hydrostatic-H fixed point re-converging
    # from a different starting profile (solver tolerance ~1e-6 of yn on
    # this 41-level grid)
    np.testing.assert_allclose(res1.yn, res_plain.yn, rtol=2e-5)
    # SE inflation: chisq (measurement misfit weighted by SE^-1) must be
    # strictly smaller than with the uninflated SE at the same yn
    resid = res1.yn - s.y
    chisq_uninflated = float(
        resid @ np.linalg.solve(s.se, resid) / s.y.shape[0]
    )
    assert res1.chisq < chisq_uninflated


def test_lin3_substitutes_and_bakes(chained_deck):
    """LIN=3: a-priori substitution AND baking; all matched variables are
    re-retrieved, so no forward-model error is added (the reference zeroes
    those Jacobian columns, Retrievals.py:262-275)."""
    dst, res0 = chained_deck
    res3 = retrieval_nemesis(dst, "cirstest", lin=3, niter=0,
                             write_outputs=False)
    np.testing.assert_allclose(res3.xn, res0.xn, rtol=1e-7)
    # chisq uses the UNinflated SE (SF=0): recomputing it from the result's
    # own residual and the deck SE must reproduce it
    s = make_retrieval_setup(dst, "cirstest")
    resid = res3.yn - s.y
    chisq = float(resid @ np.linalg.solve(s.se, resid) / s.y.shape[0])
    np.testing.assert_allclose(res3.chisq, chisq, rtol=1e-8)


@pytest.mark.slow
def test_lin1_unmatched_variable_bakes_into_yn(tmp_path):
    """LIN=1 with a .pre variable that is NOT in the current .apr: the
    previous model is reconstructed from its (varident, varparam) bookmark
    (reference Files.read_pre:1623 from_bookmark; Retrievals.py:171-196),
    baked into the base atmosphere, and -- being a scale-type model the new
    retrieval does not re-apply -- visibly shifts yn vs an unchained run.
    SE also inflates through K_prev over the unmatched variable."""
    dst = str(tmp_path / "deck")
    shutil.copytree(DECK, dst)
    shutil.copytree("tests/fixtures/ktables", str(tmp_path / "ktables"))

    apr1 = open(os.path.join(dst, "cirstest.apr")).read()

    # two-variable .apr: continuous T + log-scale of NH3 (gas 11, model 3)
    with open(os.path.join(dst, "cirstest.apr"), "w") as f:
        f.write("** chained test apr **\n2\n")
        f.write("0 0 0\ntestapr.dat\n")
        f.write("11 0 3\n0.5 0.2\n")
    retrieval_nemesis(dst, "cirstest", niter=1, write_outputs=True)
    shutil.copyfile(
        os.path.join(dst, "cirstest.raw"), os.path.join(dst, "cirstest.pre")
    )
    prev = out_mod.read_raw(os.path.join(dst, "cirstest.pre"))
    assert len(prev["varidents"]) == 2

    # back to the single-variable .apr: the NH3 scale is now unmatched
    with open(os.path.join(dst, "cirstest.apr"), "w") as f:
        f.write(apr1)
    res_plain = retrieval_nemesis(dst, "cirstest", lin=0, niter=0,
                                  write_outputs=False)
    res1 = retrieval_nemesis(dst, "cirstest", lin=1, niter=0,
                             write_outputs=False)

    # the baked 0.5x NH3 scaling must shift the forward spectrum
    dyn = np.abs(res1.yn - res_plain.yn) / np.abs(res_plain.yn).max()
    assert dyn.max() > 1e-4, "baked unmatched variable left yn unchanged"

    # and the unmatched variable's uncertainty must inflate SE (chisq drops
    # vs recomputing with the deck SE at the same residual)
    s = make_retrieval_setup(dst, "cirstest")
    resid = res1.yn - s.y
    chisq_uninflated = float(
        resid @ np.linalg.solve(s.se, resid) / s.y.shape[0]
    )
    assert res1.chisq < chisq_uninflated
