"""End-to-end retrieval pipeline on the Jupiter nadir deck: pure forward
function + jacfwd Jacobian + OE loop.

Goldens:
- jupiter_oe.npz (tools/gen_oe_golden.py): reference forward spectrum YN and
  its ANALYTIC Jacobian KK. Note the reference's analytic K deviates from a
  finite difference of its own forward model by up to ~10 % of peak (it
  neglects the hydrostatic height re-balance dependence on temperature);
  jupiter_fd_jac.npz stores a central-difference column of the reference
  forward model (state element 14, dx=0.5 K), which our AD matches to
  <1e-5 of peak. The analytic-K comparison is therefore loose by design.
- the OE loop is checked functionally: phi must decrease monotonically on
  accepted steps and the fit must beat the a-priori by a wide margin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.retrievals import make_retrieval_setup, run_retrieval

GOLDEN = "tests/goldens/jupiter_oe.npz"
FD_GOLDEN = "tests/goldens/jupiter_fd_jac.npz"
DECK = "tests/fixtures/jupiter_nadir"


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    s = make_retrieval_setup(DECK, "cirstest")
    return d, s


def test_apriori_and_measurement_vector(setup):
    d, s = setup
    np.testing.assert_allclose(s.sv.xa, d["XA"], rtol=1e-10)
    np.testing.assert_allclose(s.sv.sa, d["SA"], rtol=1e-8)
    np.testing.assert_allclose(s.y, d["Y"], rtol=1e-10)
    np.testing.assert_allclose(np.diag(s.se), np.diag(d["SE"]), rtol=1e-10)


def test_forward_matches_reference(setup):
    d, s = setup
    yn = np.asarray(s.forward_fn(jnp.asarray(d["XN"])))
    peak = np.abs(d["YN"]).max()
    np.testing.assert_allclose(yn, d["YN"], rtol=0, atol=5e-5 * peak)


def test_jvp_matches_reference_finite_difference(setup):
    """One forward-mode tangent vs a central difference of the REFERENCE
    forward model: validates the full differentiation chain (state ->
    hydrostatic rebalance -> layering -> opacity -> RT -> convolution)."""
    d, s = setup
    fd = np.load(FD_GOLDEN)
    j = int(fd["J"])
    tangent = np.zeros(s.sv.nx)
    tangent[j] = 1.0
    _, dy = jax.jvp(
        s.forward_fn, (jnp.asarray(d["XN"]),), (jnp.asarray(tangent),)
    )
    peak = np.abs(fd["COL"]).max()
    np.testing.assert_allclose(
        np.asarray(dy), fd["COL"], rtol=0, atol=3e-5 * peak
    )


def test_jacobian_close_to_reference_analytic(setup):
    """Loose check against the reference ANALYTIC K (see module docstring):
    same weighting-function structure, differences bounded by the reference's
    own neglected hydrostatic chain (~10 % of peak)."""
    d, s = setup
    fd = np.load(FD_GOLDEN)
    j = int(fd["J"])
    tangent = np.zeros(s.sv.nx)
    tangent[j] = 1.0
    _, dy = jax.jvp(
        s.forward_fn, (jnp.asarray(d["XN"]),), (jnp.asarray(tangent),)
    )
    g = d["KK"][:, j]
    peak = np.abs(g).max()
    assert np.abs(np.asarray(dy) - g).max() < 0.15 * peak
    cos = (np.asarray(dy) @ g) / np.sqrt((np.asarray(dy) ** 2).sum() * (g**2).sum())
    assert cos > 0.99


def test_oe_loop_converges_nonlinear_toy():
    """LM accept/reject/brake loop on a small nonlinear problem (the
    full-deck loop is exercised by bench.py; a run here would need the
    81-tangent jacfwd each iteration, minutes of CPU compile)."""
    from archnemesis_tpu.retrieval.oe import coreret_oe

    rng = np.random.default_rng(3)
    nx, ny = 6, 40
    a_mat = jnp.asarray(rng.normal(size=(ny, nx)) / np.sqrt(nx))

    def fwd(x):
        return jnp.exp(a_mat @ x) + 0.1 * (a_mat @ x) ** 2

    x_true = rng.normal(size=nx) * 0.5
    y = np.asarray(fwd(jnp.asarray(x_true)))
    se = np.diag(np.full(ny, (0.01 * np.abs(y).mean()) ** 2))
    xa = np.zeros(nx)
    sa = np.eye(nx)
    res = coreret_oe(
        fwd, xa, sa, y, se, lx=np.zeros(nx, dtype=int), niter=15,
        philimit=0.01,
    )
    assert res.n_iter >= 1
    assert all(
        b <= a * (1 + 1e-12)
        for a, b in zip(res.phi_history, res.phi_history[1:])
    )
    assert res.phi < 1e-2 * res.phi_history[0]
    np.testing.assert_allclose(res.xn, x_true, atol=0.05)
    assert res.st.shape == (nx, nx)
