"""Mie stack vs the reference oracle (Scatter_0.py: dmie:1399,
miescat:1600, makephase:1835, kk_new_sub:2169, subfithgm:1948)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.ops import mie as mie_mod


@pytest.fixture(scope="module")
def ref():
    import importlib

    from tools.refutils import import_reference

    import_reference()
    return importlib.import_module("archnemesis.Scatter_0")


THETA = np.array([0.0, 10.0, 25.0, 40.0, 55.0, 70.0, 80.0, 90.0])
WAVEL = np.array([0.8, 1.4, 2.5])
REFIND = np.stack(
    [np.array([1.42, 1.38, 1.33]), np.array([0.01, 0.05, 0.002])], axis=1
)


def _compare_makephase(ref, iscat, pars, rs, rtol=1e-8):
    xs_r, xe_r, thx_r, ph_r = ref.makephase(
        WAVEL.copy(), iscat, np.asarray(pars, float), np.asarray(rs, float),
        REFIND.copy(), THETA.copy(),
    )
    xs, xe, thx, ph = mie_mod.makephase(
        WAVEL, iscat, np.asarray(pars, float), rs, REFIND, THETA
    )
    np.testing.assert_allclose(np.asarray(thx), thx_r, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xs), xs_r, rtol=rtol)
    np.testing.assert_allclose(np.asarray(xe), xe_r, rtol=rtol)
    np.testing.assert_allclose(np.asarray(ph), ph_r, rtol=rtol)


def test_gamma_distribution_explicit_grid(ref):
    # standard gamma a=0.3, b=0.2, alpha -> explicit Simpson grid
    _compare_makephase(
        ref, 1, (0.3, 0.2, (1 - 3 * 0.2) / 0.2), (0.015, 1.5, 0.015)
    )


def test_lognormal_auto_termination(ref):
    # log-normal with the reference's auto rs (rs[1] < rs[0])
    r0 = 0.015 * WAVEL.min()
    _compare_makephase(ref, 2, (0.4, 0.25, 0.0), (r0, 0.0, r0))


def test_single_size(ref):
    # the class wrapper sets rs[:] = r0 for iscat=4 (Scatter_0.py:1327-1329)
    _compare_makephase(ref, 4, (0.7, 0.0, 0.0), (0.7, 0.7, 0.7))


def test_isotropic_hg_dipole(ref):
    _compare_makephase(ref, 5, (0.0,), (0.015, 1.0, 0.015))
    _compare_makephase(ref, 6, (0.4, 0.6, -0.3), (0.015, 1.0, 0.015))
    _compare_makephase(ref, 7, (0.2, 0.0, 0.0), (0.015, 1.0, 0.015))


def test_kramers_kronig(ref):
    rng = np.random.default_rng(5)
    vi = np.linspace(800.0, 4000.0, 60)
    k_im = 0.01 + 0.2 * np.exp(-0.5 * ((vi - 2200.0) / 300.0) ** 2)
    n_ref = ref.kk_new_sub(vi, k_im, 1500.0, 1.4)
    n_jax = np.asarray(mie_mod.kk_new_sub(vi, k_im, 1500.0, 1.4))
    np.testing.assert_allclose(n_jax, n_ref, rtol=1e-10)
    # descending input branch
    n_ref2 = ref.kk_new_sub(vi[::-1].copy(), k_im[::-1].copy(), 1500.0, 1.4)
    n_jax2 = np.asarray(
        mie_mod.kk_new_sub(vi[::-1].copy(), k_im[::-1].copy(), 1500.0, 1.4)
    )
    np.testing.assert_allclose(n_jax2, n_ref2, rtol=1e-10)


def test_subfithgm_recovers_hg_params(ref):
    thetax = np.linspace(0.0, 180.0, 37)
    calpha = np.cos(np.deg2rad(thetax))
    true = (0.7, 0.55, -0.35)
    ph = mie_mod._henyey2_np(calpha, *true)
    f, g1, g2, rms = mie_mod.subfithgm(thetax, ph[None, :])
    assert abs(f[0] - true[0]) < 0.02
    assert abs(g1[0] - true[1]) < 0.01
    assert abs(g2[0] - true[2]) < 0.01
    # and against the reference fitter on a Mie-like phase function
    _, _, thx, ph_mie = mie_mod.makephase(
        WAVEL[:1], 4, (0.5, 0.0, 0.0), (0.0, 0.0, 0.0), REFIND[:1], THETA
    )
    ph_mie = np.asarray(ph_mie)
    f_r, g1_r, g2_r, _ = ref.subfithgm(np.asarray(thx), ph_mie)
    f_j, g1_j, g2_j, _ = mie_mod.subfithgm(np.asarray(thx), ph_mie)
    np.testing.assert_allclose(f_j, f_r, atol=2e-3)
    np.testing.assert_allclose(g1_j, g1_r, atol=2e-3)
    np.testing.assert_allclose(g2_j, g2_r, atol=2e-3)


def test_makephase_differentiable():
    """AD through the Mie chain (the reference needs finite differences
    for model 444; jacfwd must produce finite, accurate derivatives)."""

    def f(r0):
        xs, xe, _, _ = mie_mod.makephase(
            WAVEL, 4, jnp.stack([r0, 0.0, 0.0]), (0.0, 0.0, 0.0),
            REFIND, THETA, nmax=80, n_start=150,
        )
        return jnp.sum(xe)

    r0 = jnp.asarray(0.6)
    g = jax.grad(f)(r0)
    fd = (f(r0 + 1e-5) - f(r0 - 1e-5)) / 2e-5
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)
