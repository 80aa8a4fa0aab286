"""Random-overlap mixing vs the reference's k_overlap (oracle, pure Python)."""

import numpy as np
import pytest

from archnemesis_tpu.ops.overlap import mix_gas_k


@pytest.fixture(scope="module")
def reference_k_overlap():
    from tools.refutils import import_reference

    import_reference()
    from archnemesis.ForwardModel_0 import k_overlap

    return k_overlap


def _gauss_g(ng):
    x, w = np.polynomial.legendre.leggauss(ng)
    return 0.5 * (x + 1), 0.5 * w


@pytest.mark.parametrize("ngas", [1, 2, 4])
def test_mix_matches_reference(reference_k_overlap, ngas):
    rng = np.random.default_rng(7)
    ng, nwave, nlay = 20, 6, 5
    _, del_g = _gauss_g(ng)
    # increasing-in-g positive k distributions of varying magnitude
    base = 10 ** rng.uniform(-26, -22, (nwave, 1, nlay, ngas))
    spread = np.exp(3.0 * (np.sort(rng.uniform(0, 1, (1, ng, 1, 1)), axis=1)))
    k_gas = base * spread
    amounts = 10 ** rng.uniform(18, 22, (ngas, nlay))

    want = reference_k_overlap(del_g, k_gas, amounts)
    got = np.asarray(mix_gas_k(del_g, k_gas, amounts))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=0)


def test_mix_zero_gas_skipped(reference_k_overlap):
    """A gas with zero opacity in some layers must be skipped exactly."""
    rng = np.random.default_rng(3)
    ng, nwave, nlay, ngas = 10, 3, 4, 3
    _, del_g = _gauss_g(ng)
    k_gas = 10 ** rng.uniform(-25, -22, (nwave, ng, nlay, ngas))
    k_gas = np.sort(k_gas, axis=1)
    k_gas[:, :, 1, 0] = 0.0  # gas 0 empty in layer 1
    k_gas[:, :, 2, :] = 0.0  # all gases empty in layer 2
    amounts = 10 ** rng.uniform(18, 21, (ngas, nlay))

    want = reference_k_overlap(del_g, k_gas, amounts)
    got = np.asarray(mix_gas_k(del_g, k_gas, amounts))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-300)
