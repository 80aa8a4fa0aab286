"""FULL optimal-estimation retrieval vs the reference coreretOE trajectory.

Golden (tests/goldens/jupiter_retrieval.npz, tools/gen_retrieval_golden.py):
the reference's complete LM-damped Gauss-Newton retrieval
(OptimalEstimation_0.coreretOE:1173) on the reduced Jupiter CIRS nadir deck
(tests/fixtures/jupiter_fdret) for NITER iterations, with the reference
forced down its NUMERICAL (finite-difference) Jacobian path
(Variables.NUM[:]=1, ForwardModel_0.py:2251) — the reference's analytic K
neglects the hydrostatic-T coupling (~10% of peak, test_retrieval_e2e.py),
so only the FD trajectory is comparable with this repo's exact AD K. Mirrors the reference's own end-to-end retrieval test
(tests/test_zzz_retrieval.py:122-212), which asserts the output spectrum at
rtol 5e-2 / atol median*1e-2 — here the oracle is the reference itself, so
the contract is much tighter.
"""

import os
import shutil

import numpy as np
import pytest

DECK = "tests/fixtures/jupiter_fdret"
GOLDEN = "tests/goldens/jupiter_retrieval.npz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="jupiter_retrieval golden not generated"
)


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    from archnemesis_tpu.retrievals import retrieval_nemesis

    d = np.load(GOLDEN)
    base = tmp_path_factory.mktemp("fullret")
    dst = str(base / "deck")
    shutil.copytree(DECK, dst)
    shutil.copytree("tests/fixtures/ktables", str(base / "ktables"))
    res = retrieval_nemesis(dst, "cirstest", niter=int(d["niter"]),
                            philimit=float(d["philimit"]),
                            write_outputs=False)
    return d, res


def test_final_spectrum_matches_reference(result):
    """Tolerances bound the one remaining honest difference: the oracle's
    NUM=1 Jacobian carries O(DSTEP) forward-difference truncation error
    while this repo's AD K is exact, so the two LM trajectories drift
    slightly over 3 unconverged iterations (measured: yn <= 0.3% rel,
    phi <= 4e-4 rel, ST diag <= 1% rel on this deck)."""
    d, res = result
    yn_ref = np.asarray(d["YN"])
    yn = np.asarray(res.yn)
    np.testing.assert_allclose(
        yn, yn_ref, rtol=5e-3, atol=np.median(np.abs(yn_ref)) * 1e-4)


def test_final_state_matches_reference(result):
    d, res = result
    xn_ref = np.asarray(d["XN"])
    np.testing.assert_allclose(np.asarray(res.xn), xn_ref, rtol=1e-3,
                               atol=1e-3 * np.abs(xn_ref).max())


def test_cost_trajectory_matches_reference(result):
    """phi/chisq after each accepted iteration track the reference's
    history (return_phi_and_chisq_history in coreretOE)."""
    d, res = result
    phi_ref = np.asarray(d["PHI_HIST"], dtype=float)
    phi_got = np.asarray(res.phi_history, dtype=float)
    n = min(len(phi_ref), len(phi_got))
    np.testing.assert_allclose(phi_got[:n], phi_ref[:n], rtol=1e-3)


def test_posterior_covariance_matches_reference(result):
    d, res = result
    st_ref = np.asarray(d["ST"])
    st = np.asarray(res.st)
    scale = np.abs(np.diagonal(st_ref)).max()
    # FD-vs-AD K difference propagates quadratically into ST; measured
    # diag <= 1% rel, off-diagonal <= 0.4% of the diagonal scale
    np.testing.assert_allclose(st, st_ref, rtol=2e-2, atol=scale * 5e-3)
    np.testing.assert_allclose(
        np.diagonal(st), np.diagonal(st_ref), rtol=2e-2)
