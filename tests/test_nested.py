"""Nested sampling vs analytic evidence (gaussian likelihood x gaussian
prior), mirroring the reference coreretNS setup (NestedSampling_0.py:291)."""

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.retrieval.nested import (
    coreret_ns,
    gaussian_prior_transform,
)


def test_evidence_and_posterior_gaussian():
    ndim = 3
    prior_sig = np.array([1.0, 2.0, 0.5])
    mu = np.array([0.7, -1.0, 0.2])
    like_sig = np.array([0.3, 0.5, 0.2])

    def loglike(x):
        return jnp.sum(
            -0.5 * ((x - mu) / like_sig) ** 2
            - jnp.log(like_sig * jnp.sqrt(2.0 * jnp.pi))
        )

    transform = gaussian_prior_transform(np.zeros(ndim), prior_sig)
    res = coreret_ns(
        loglike, transform, ndim, n_live=300, evidence_tolerance=0.01,
        seed=2,
    )

    # analytic evidence: Z = prod_d N(mu_d; 0, prior^2 + like^2)
    tot = prior_sig**2 + like_sig**2
    logz_true = float(
        np.sum(-0.5 * mu**2 / tot - 0.5 * np.log(2.0 * np.pi * tot))
    )
    assert abs(res.logz - logz_true) < max(3.0 * res.logz_err, 0.15), (
        res.logz, logz_true, res.logz_err,
    )

    post_mean = mu * prior_sig**2 / tot
    post_std = np.sqrt(1.0 / (1.0 / prior_sig**2 + 1.0 / like_sig**2))
    np.testing.assert_allclose(res.means, post_mean, atol=0.06)
    np.testing.assert_allclose(res.stds, post_std, rtol=0.25)
    assert res.n_iter > 300
    assert np.isclose(res.weights.sum(), 1.0)


def test_fixed_parameters_held_at_xa():
    """run_retrieval_ns holds sigma<floor parameters fixed — check the
    transform plumbing with a tiny synthetic problem (no deck)."""
    xa = np.array([1.0, 5.0])
    sig = np.array([0.5, 0.0])  # second parameter fixed
    vary = np.nonzero(sig > 1e-5)[0]
    sub = gaussian_prior_transform(xa[vary], sig[vary])
    xa_j = jnp.asarray(xa)
    vary_j = jnp.asarray(vary)

    def transform(u):
        return xa_j.at[vary_j].set(sub(u))

    def loglike(x):
        return -0.5 * ((x[0] - 1.2) / 0.1) ** 2

    res = coreret_ns(loglike, transform, ndim=1, n_live=100,
                     evidence_tolerance=0.05, seed=0)
    assert np.allclose(res.samples[:, 1], 5.0)
    assert abs(res.means[0] - 1.2) < 0.05
