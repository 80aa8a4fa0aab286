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


def test_output_writers_reference_readable():
    """Write .mre/.cov/.raw/.itr via retrieval_nemesis and parse them back
    with the REFERENCE readers (Files.read_mre:594, OptimalEstimation_0.
    read_cov via Files.read_cov:760, Files.read_pre:1623) — the written
    formats must be byte-compatible with the legacy NEMESIS layout. Then
    chain a LIN=2 retrieval from the written .raw renamed to .pre."""
    import os
    import shutil

    from tools.refutils import import_reference

    ans = import_reference()
    from archnemesis_tpu.retrieval.output import read_raw
    from archnemesis_tpu.retrievals import retrieval_nemesis

    # format byte-compatibility is deck-independent; the reduced deck cuts
    # the jacfwd the writers need from ~3 min to seconds
    WDECK = "tests/fixtures/jupiter_fdret"
    base = os.path.join(WDECK, "cirstest")
    created = [base + ext for ext in (".mre", ".cov", ".raw", ".itr", ".pre")]
    try:
        # niter=0: the OE loop still produces yn/K/gain/covariances at the
        # a-priori — enough to exercise every writer (a jacfwd eval costs
        # ~3 min of CPU here, so keep the iteration count minimal)
        res = retrieval_nemesis(WDECK, "cirstest", niter=0, write_outputs=True)
        assert os.path.exists(base + ".mre")

        # --- .mre through the reference reader (xfac=1e9 for radiance/cm-1)
        (lat, lon, ngeom, ny, wave, specret, specmeas, specerrmeas, nx, var,
         aprprof, aprerr, retprof, reterr) = ans.Files.read_mre(base)
        assert ngeom == 1 and nx == res.xn.size
        np.testing.assert_allclose(specret[:, 0], res.yn * 1.0e9, rtol=1e-6)

        # --- .cov through the reference reader
        (npro, nvar, varident, varparam, nxc, nyc, sa, sm, sn, st, se, aa,
         dd, kk) = ans.Files.read_cov(base)
        assert (nxc, nyc) == (res.xn.size, res.yn.size)
        np.testing.assert_allclose(st, res.st, rtol=1e-6)
        np.testing.assert_allclose(aa, res.aa, rtol=0, atol=1e-6 * np.abs(res.aa).max())
        np.testing.assert_allclose(kk, res.kk, rtol=0, atol=1e-6 * np.abs(res.kk).max())

        # --- .raw: our round-trip AND the reference read_pre
        prev = read_raw(base + ".raw")
        np.testing.assert_allclose(prev["xn"], res.xn, rtol=1e-7)
        np.testing.assert_allclose(prev["st"], res.st, rtol=1e-6)
        shutil.copy(base + ".raw", base + ".pre")
        var_prev = ans.Files.read_pre(base)
        np.testing.assert_allclose(var_prev.XN, res.xn, rtol=1e-7)

        # --- LIN=2 chaining: previous posterior becomes the new a-priori
        res2 = retrieval_nemesis(
            WDECK, "cirstest", lin=2, niter=0, write_outputs=False
        )
        np.testing.assert_allclose(res2.xn, res.xn, rtol=1e-10)
    finally:
        for p in created:
            if os.path.exists(p):
                os.remove(p)


def test_itr_writer_format(tmp_path, setup):
    """.itr layout (reference coreretOE OptimalEstimation_0.py:1310-1396)
    checked on synthetic records: header + per-record chisq/phi, XN1, XA,
    Y, SE diag, YN1, YN, column-major KK."""
    from archnemesis_tpu.retrieval.output import write_itr

    _, s = setup
    nx, ny = s.sv.nx, s.y.shape[0]
    rng = np.random.default_rng(0)
    rec = dict(
        chisq=1.5, phi=2.5,
        xn1=rng.normal(size=nx), yn1=rng.normal(size=ny),
        yn=rng.normal(size=ny), kk=rng.normal(size=(ny, nx)),
    )
    path = tmp_path / "t.itr"
    write_itr(str(path), s, [rec])
    lines = path.read_text().splitlines()
    hdr = lines[0].split()
    assert [int(v) for v in hdr] == [nx, ny, 1]
    chisq, phi = (float(v) for v in lines[1].split())
    assert np.isclose(chisq, 1.5) and np.isclose(phi, 2.5)
    body = np.array([float(v) for v in lines[2:]])
    assert body.size == 2 * nx + 4 * ny + nx * ny
    np.testing.assert_allclose(body[:nx], rec["xn1"], rtol=5e-4)
    np.testing.assert_allclose(body[nx : 2 * nx], s.sv.xa, rtol=5e-4)
    kk_flat = body[2 * nx + 4 * ny :]
    kk_back = kk_flat.reshape(nx, ny).T  # written column-major
    np.testing.assert_allclose(kk_back, rec["kk"], rtol=5e-4)

