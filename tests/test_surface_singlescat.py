"""Surface BRDF models + single-scattering kernel vs the reference oracle.

Golden: tests/goldens/surface_singlescat.npz (tools/gen_surface_golden.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.rt.singlescat import single_scatter_plane_spectrum
from archnemesis_tpu.rt.surface import hapke_brdf, lambert_brdf, oren_nayar_brdf

GOLDEN = "tests/goldens/surface_singlescat.npz"


@pytest.fixture(scope="module")
def d():
    return np.load(GOLDEN)


def test_hapke_brdf(d):
    got = np.asarray(
        hapke_brdf(
            d["W"], d["K"], d["BS0"], d["HS"], d["BC0"], d["HC"],
            d["ROUGH"], d["G1"], d["G2"], d["F"],
            d["SOL"], d["EMI"], d["AZI"],
        )
    )
    np.testing.assert_allclose(got, d["HAPKE"], rtol=1e-10, atol=1e-14)


def test_oren_nayar_brdf(d):
    got = np.asarray(
        oren_nayar_brdf(d["ALB"], d["ON_ROUGH"], d["SOL"], d["EMI"], d["AZI"])
    )
    np.testing.assert_allclose(got, d["OREN"], rtol=1e-10, atol=1e-14)


def test_lambert_brdf(d):
    got = np.asarray(lambert_brdf(d["ALB"], 4))
    assert got.shape == (d["ALB"].shape[0], 4)
    np.testing.assert_allclose(got[:, 0], d["ALB"] / np.pi, rtol=1e-12)


@pytest.mark.parametrize("key,tsurf", [("SS_nosurf", -1.0), ("SS_surf", 290.0)])
def test_single_scatter_spectrum(d, key, tsurf):
    nlayin = d["EMTEMP"].shape[0]
    got = np.asarray(
        single_scatter_plane_spectrum(
            jnp.asarray(d["WAVE"]),
            jnp.asarray(d["TAU"]),
            jnp.asarray(d["EMTEMP"]),
            jnp.asarray(d["OMEGA"]),
            jnp.asarray(d["PHASE"]),
            jnp.ones(nlayin),
            tsurf,
            jnp.asarray(d["EMISSIVITY"]),
            jnp.asarray(d["BRDF_PATH"]),
            jnp.asarray(d["SOLAR"]),
            35.0,
            20.0,
            ispace=0,
        )
    )
    np.testing.assert_allclose(got, d[key], rtol=1e-10, atol=0)


def test_single_scatter_mask_matches_truncation(d):
    """Padded+masked evaluation must equal the truncated-path evaluation."""
    n = 6
    got_trunc = np.asarray(
        single_scatter_plane_spectrum(
            jnp.asarray(d["WAVE"]), jnp.asarray(d["TAU"][:, :, :n]),
            jnp.asarray(d["EMTEMP"][:n]), jnp.asarray(d["OMEGA"][:, :, :n]),
            jnp.asarray(d["PHASE"][:, :n]), jnp.ones(n), -1.0,
            jnp.asarray(d["EMISSIVITY"]), jnp.asarray(d["BRDF_PATH"]),
            jnp.asarray(d["SOLAR"]), 35.0, 20.0,
        )
    )
    mask = np.zeros(d["EMTEMP"].shape[0])
    mask[:n] = 1.0
    got_masked = np.asarray(
        single_scatter_plane_spectrum(
            jnp.asarray(d["WAVE"]), jnp.asarray(d["TAU"]),
            jnp.asarray(d["EMTEMP"]), jnp.asarray(d["OMEGA"]),
            jnp.asarray(d["PHASE"]), jnp.asarray(mask), -1.0,
            jnp.asarray(d["EMISSIVITY"]), jnp.asarray(d["BRDF_PATH"]),
            jnp.asarray(d["SOLAR"]), 35.0, 20.0,
        )
    )
    np.testing.assert_allclose(got_masked, got_trunc, rtol=1e-12)
