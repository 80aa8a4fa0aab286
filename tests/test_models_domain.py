"""Non-atmosphere-domain and PostRT spectral models vs the reference.

Golden (tests/goldens/models_domain.npz, tools/gen_models2_golden.py).
Several of these models are partially broken upstream (887 parse import /
calculate attribute errors, 232/233/667 spectral wrappers assume the
calc-grid equals the convolution grid, and 232/233 index 1-D spectra as
2-D when writing gradients); where the reference cannot run, the golden
encodes the model's documented semantics — noted per case in the
generator.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.io.legacy import load_deck
from archnemesis_tpu.retrieval.statevector import (
    apply_domain,
    apply_spectrum_models,
    apply_state,
    read_apr,
)

GOLDEN = "tests/goldens/models_domain.npz"
DECK = "tests/fixtures/jupiter_nadir"

ALL = [
    "m999_tsurf", "m777_tanhe", "m666_ptan", "m887_xsc",
    "m231_poly", "m232_angstrom", "m233_quad", "m667_dilution",
]


@pytest.fixture(scope="module")
def setup():
    d = np.load(GOLDEN)
    deck = load_deck(DECK, "cirstest")
    return d, deck


@pytest.mark.parametrize("name", ALL)
def test_apr_parsing(setup, name):
    d, deck = setup
    sv = read_apr(f"tests/fixtures/models/{name}/test.apr", deck.atmosphere)
    np.testing.assert_allclose(sv.xa, d[f"{name}_XA"], rtol=1e-10, err_msg=name)
    np.testing.assert_allclose(sv.sa, d[f"{name}_SA"], rtol=1e-8, atol=1e-30)
    np.testing.assert_array_equal(sv.lx, d[f"{name}_LX"])


def test_tsurf_applied(setup):
    d, deck = setup
    sv = read_apr("tests/fixtures/models/m999_tsurf/test.apr", deck.atmosphere)
    surf = apply_domain(sv, jnp.asarray(sv.xa), "surface", deck.surface)
    np.testing.assert_allclose(float(surf.tsurf), float(d["m999_tsurf_TSURF"]))


def test_tanhe_shift(setup):
    d, deck = setup
    sv = read_apr("tests/fixtures/models/m777_tanhe/test.apr", deck.atmosphere)
    ms = apply_domain(sv, jnp.asarray(sv.xa), "measurement", {})
    got = 12.0 + float(ms["tanhe_shift"])
    np.testing.assert_allclose(got, d["m777_tanhe_TANHE"][0])


def test_ptan_anchor(setup):
    d, deck = setup
    sv = read_apr("tests/fixtures/models/m666_ptan/test.apr", deck.atmosphere)
    atm = apply_state(deck.atmosphere, jnp.asarray(sv.xa), sv,
                      adjust_hydrostat=False)
    np.testing.assert_allclose(
        np.asarray(atm.p), d["m666_ptan_P"], rtol=1e-8
    )


def test_xsc_applied(setup):
    d, deck = setup
    sv = read_apr("tests/fixtures/models/m887_xsc/test.apr", deck.atmosphere)
    aero = apply_domain(sv, jnp.asarray(sv.xa), "scatter", deck.aerosol)
    np.testing.assert_allclose(
        np.asarray(aero.kext), d["m887_xsc_KEXT"], rtol=1e-10
    )


def test_poly_scaling_231(setup):
    d, deck = setup
    sv = read_apr("tests/fixtures/models/m231_poly/test.apr", deck.atmosphere)
    nconv = int(deck.geometry.nconv[0])
    vconv = d["VCONV"][:nconv, 0]
    spec_in = jnp.asarray(d["SPECMOD_IN"][:nconv, 0])
    got = apply_spectrum_models(sv, jnp.asarray(sv.xa), 0, vconv, spec_in)
    np.testing.assert_allclose(
        np.asarray(got), d["m231_poly_SPECMOD"][:nconv, 0], rtol=1e-10
    )


@pytest.mark.parametrize("name", ["m232_angstrom", "m233_quad"])
def test_continuum_dimming(setup, name):
    d, deck = setup
    sv = read_apr(f"tests/fixtures/models/{name}/test.apr", deck.atmosphere)
    wavec = d[f"{name}_WAVEC"]
    got = apply_spectrum_models(
        sv, jnp.asarray(sv.xa), 0, wavec, jnp.asarray(d[f"{name}_SPEC_IN"])
    )
    np.testing.assert_allclose(
        np.asarray(got), d[f"{name}_SPECMOD"], rtol=1e-10
    )


def test_dilution_667(setup):
    d, deck = setup
    sv = read_apr("tests/fixtures/models/m667_dilution/test.apr",
                  deck.atmosphere)
    nconv = int(deck.geometry.nconv[0])
    vconv = d["VCONV"][:nconv, 0]
    spec_in = jnp.asarray(d["SPECMOD_IN"][:nconv, 0])
    got = apply_spectrum_models(sv, jnp.asarray(sv.xa), 0, vconv, spec_in)
    np.testing.assert_allclose(
        np.asarray(got), d["m667_dilution_SPECMOD"][:nconv, 0], rtol=1e-10
    )


def test_radius_override_models():
    """Models 555/556 (parse + our superset semantics: the reference
    silently discards the correction for catalogue planets)."""
    deck = load_deck(DECK, "cirstest")
    import io

    from archnemesis_tpu.models.base import MODEL_REGISTRY

    apr = io.StringIO("5.0 1.0\n")
    res = MODEL_REGISTRY[555].from_apr(apr, [555, 0, 555], 0, {})
    atm = MODEL_REGISTRY[555].apply(res.entry, deck.atmosphere,
                                    jnp.asarray([5.0]))
    assert atm.planet_radius is not None

    apr = io.StringIO("1.01 0.005\n")
    res = MODEL_REGISTRY[556].from_apr(apr, [556, 0, 556], 0, {})
    atm2 = MODEL_REGISTRY[556].apply(res.entry, deck.atmosphere,
                                     jnp.asarray([1.01]))
    np.testing.assert_allclose(
        float(atm2.planet_radius) / 1.01, float(atm.planet_radius) - 5.0e3,
        rtol=1e-10,
    )
