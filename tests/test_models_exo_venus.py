"""Models 43/62 (exoplanet T profiles), 110/111 (Venus clouds), 447
(Doppler) vs the reference oracle.

Golden: tests/goldens/models_exo_venus.npz (tools/gen_models3_golden.py).
Models 43 and 62 have broken subprofretg wrappers upstream (43's from_apr
passes six args to a 3-4-arg constructor; 62's wrapper assigns the
(atm, xmap) tuple to AtmosphereX) — goldens use direct calculate calls.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.core.types import Atmosphere
from archnemesis_tpu.io.legacy import load_deck
from archnemesis_tpu.models.base import MODEL_REGISTRY
from archnemesis_tpu.retrieval.statevector import read_apr

GOLDEN = "tests/goldens/models_exo_venus.npz"
DECK = "tests/fixtures/jupiter_nadir"


@pytest.fixture(scope="module")
def setup():
    return np.load(GOLDEN), load_deck(DECK, "cirstest").atmosphere


@pytest.mark.parametrize("name", ["m62_madhu", "m447_doppler"])
def test_apr_parsing(setup, name):
    d, atm = setup
    sv = read_apr(f"tests/fixtures/models/{name}/test.apr", atm)
    np.testing.assert_allclose(sv.xa, d[f"{name}_XA"], rtol=1e-10)
    np.testing.assert_allclose(sv.sa, d[f"{name}_SA"], rtol=1e-8, atol=1e-30)
    np.testing.assert_array_equal(sv.lx, d[f"{name}_LX"])


def test_model43_guillot(setup):
    d, atm = setup
    e = MODEL_REGISTRY[43]
    import io

    apr = io.StringIO(
        "0.3 0.05\n0.8 0.1\n1.0e-3 2e-4\n0.2 0.05\n2.0 0.4\n"
        "5700.0 6.96e8 7.78e11 150.0\n"
    )
    ctx = dict(npro=atm.np_, gas_id=atm.gas_id, iso_id=atm.iso_id,
               ndust=atm.ndust)
    res = e.from_apr(apr, [0, 0, 43], 0, ctx)
    x = np.array([0.3, 0.8, 1.0e-3, 0.2, 2.0])
    out = e.apply(res.entry, atm, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.t), d["m43_T"], rtol=1e-7)


def test_model62_madhu(setup):
    d, atm = setup
    sv = read_apr("tests/fixtures/models/m62_madhu/test.apr", atm)
    e = sv.entries[0]
    x = np.where(sv.lx == 1, np.exp(sv.xa), sv.xa)
    out = MODEL_REGISTRY[62].apply(e, atm, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out.t), d["m62_T"], rtol=1e-10)


def _venus_atm():
    npro = 40
    h = np.linspace(0.0, 90.0e3, npro)
    return Atmosphere(
        h=h, p=9.2e6 * np.exp(-h / 15.9e3),
        t=np.linspace(730.0, 170.0, npro),
        vmr=np.stack([np.full(npro, 0.965), np.full(npro, 1.5e-4)], axis=1),
        dust=np.zeros((npro, 4)), parah2=np.zeros(npro),
        molwt=np.full(npro, 43.45e-3), radius=np.asarray(6.0518e6),
        latitude=np.asarray(0.0), gas_id=(2, 9), iso_id=(0, 0), planet=2,
    )


def test_model110_venus_cloud(setup):
    d, _ = setup
    atm = _venus_atm()
    from archnemesis_tpu.models.base import ModelEntry, ProfileTarget

    e = ModelEntry(varident=(-1, 0, 110), model_id=110, ix=0, nx=1,
                   target=ProfileTarget.AEROSOL, target_idx=0)
    out = MODEL_REGISTRY[110].apply(e, atm, jnp.asarray([2.5]))
    np.testing.assert_allclose(
        np.asarray(out.dust), d["m110_DUST"], rtol=1e-10, atol=1e-30
    )


def test_model111_venus_cloud_so2(setup):
    d, _ = setup
    atm = _venus_atm()
    from archnemesis_tpu.models.base import ModelEntry, ProfileTarget

    e = ModelEntry(varident=(-1, 0, 111), model_id=111, ix=0, nx=3,
                   target=ProfileTarget.AEROSOL, target_idx=0,
                   extra=(1,))
    out = MODEL_REGISTRY[111].apply(
        e, atm, jnp.asarray([-1.5, 1.0e-4, 5.0e-6])
    )
    np.testing.assert_allclose(
        np.asarray(out.dust), d["m111_DUST"], rtol=1e-10, atol=1e-30
    )
    np.testing.assert_allclose(
        np.asarray(out.vmr), d["m111_VMR"], rtol=1e-10
    )


def test_model447_doppler(setup):
    d, atm = setup
    sv = read_apr("tests/fixtures/models/m447_doppler/test.apr", atm)
    from archnemesis_tpu.retrieval.statevector import apply_domain

    ms = apply_domain(sv, jnp.asarray(sv.xa), "measurement", {})
    np.testing.assert_allclose(float(ms["v_doppler"]), 3.5)
