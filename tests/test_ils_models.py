"""ACS-MIR double-Gaussian ILS models (228/229/230) vs the reference oracle.

Golden (tests/goldens/ils_models.npz, tools/gen_ils_golden.py): reference
Model228/229/230.calculate -> NFIL/VFIL/AFIL -> numba lblconv_fil on a
synthetic spectrum. The TPU path evaluates the Gaussians directly on the
calc grid (double_gauss_ils_weights), the limit of the reference's
sample-then-interp, so tolerance is interp-level (rtol 5e-4). Also checks
jacfwd through the ILS parameters is finite (the reference needs numeric
perturbations here; inum=1 for model 228).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.models.base import MODEL_REGISTRY, ModelEntry, ProfileTarget
from archnemesis_tpu.ops.convolution import apply_ils, double_gauss_ils_weights

GOLDEN = "tests/goldens/ils_models.npz"


@pytest.fixture(scope="module")
def d():
    return np.load(GOLDEN)


def _entry(model_id, nx, extra=()):
    return ModelEntry(
        varident=(model_id, 0, model_id), model_id=model_id, ix=0, nx=nx,
        target=ProfileTarget.NOT_ATMOSPHERIC, extra=extra,
    )


def _convolve(d, vconv, off, fw, amp):
    w = double_gauss_ils_weights(jnp.asarray(d["WAVE"]), vconv, off, fw, amp)
    return np.asarray(apply_ils(w, jnp.asarray(d["SPEC"])))


def test_model229_matches_oracle(d):
    m = MODEL_REGISTRY[229]
    vc, off, fw, amp = m.apply_ils(
        _entry(229, 7), 0, jnp.asarray(d["VCONV"]), jnp.asarray(d["P229"])
    )
    got = _convolve(d, vc, off, fw, amp)
    np.testing.assert_allclose(got, d["Y229"], rtol=5e-4)


def test_model228_matches_oracle(d):
    m = MODEL_REGISTRY[228]
    vc, off, fw, amp = m.apply_ils(
        _entry(228, 8), 0, jnp.asarray(d["VCONV"]), jnp.asarray(d["P228"])
    )
    np.testing.assert_allclose(np.asarray(vc), d["VCONV228"], rtol=1e-12)
    got = _convolve(d, vc, off, fw, amp)
    np.testing.assert_allclose(got, d["Y228"], rtol=5e-4)


def test_model230_matches_oracle(d):
    m = MODEL_REGISTRY[230]
    lims = tuple(
        (float(lo), float(hi)) for lo, hi in zip(d["LIML"], d["LIMH"])
    )
    x = jnp.asarray(d["PAR230"].T.reshape(-1))  # window-major, 7 per window
    vc, off, fw, amp = m.apply_ils(
        _entry(230, x.size, extra=(2, lims)), 0, jnp.asarray(d["VCONV"]), x
    )
    got = _convolve(d, vc, off, fw, amp)
    np.testing.assert_allclose(got, d["Y230"], rtol=5e-4)


def test_ils_jacobian_finite(d):
    m = MODEL_REGISTRY[229]

    def f(p):
        vc, off, fw, amp = m.apply_ils(
            _entry(229, 7), 0, jnp.asarray(d["VCONV"]), p
        )
        return _convolve_jnp(d, vc, off, fw, amp)

    def _convolve_jnp(d, vconv, off, fw, amp):
        w = double_gauss_ils_weights(
            jnp.asarray(d["WAVE"]), vconv, off, fw, amp
        )
        return apply_ils(w, jnp.asarray(d["SPEC"]))

    jac = np.asarray(jax.jacfwd(f)(jnp.asarray(d["P229"])))
    assert np.all(np.isfinite(jac))
    assert np.abs(jac).max() > 0
