"""Layering golden tests: JAX layering vs the reference oracle.

Goldens in tests/goldens/jupiter_layering.npz are produced by running the
reference implementation (pure-Python via tools/numba_stub) on the Jupiter
deck — see tools/gen_fixtures.py. Parity target: rtol 1e-5 in float64.
"""

import numpy as np
import pytest

from archnemesis_tpu.core.types import Atmosphere, LayerConfig
from archnemesis_tpu.rt.layer import build_layers

GOLDEN = "tests/goldens/jupiter_layering.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def layers(golden):
    d = golden
    dust_units = tuple(int(x) for x in d["DUST_UNITS_FLAG"]) or None
    atm = Atmosphere(
        h=d["H"],
        p=d["P"],
        t=d["T"],
        vmr=d["VMR"],
        dust=d["DUST"],
        parah2=d["PARAH2"],
        molwt=d["MOLWT"],
        radius=d["RADIUS"],
        latitude=d["LATITUDE"],
        gas_id=tuple(int(x) for x in d["ID"]),
        iso_id=tuple(int(x) for x in d["ISO"]),
        planet=int(d["PLANET"]),
        dust_units_flag=dust_units,
    )
    cfg = LayerConfig(
        nlay=int(d["NLAY"]),
        laytyp=int(d["LAYTYP"]),
        layint=int(d["LAYINT"]),
        layht=max(float(d["LAYHT"]), float(d["H"][0])),
    )
    return build_layers(atm, cfg, layang=float(d["LAYANG"]))


@pytest.mark.parametrize(
    "field,key",
    [
        ("baseh", "BASEH"),
        ("basep", "BASEP"),
        ("baset", "BASET"),
        ("delh", "DELH"),
        ("height", "HEIGHT"),
        ("press", "PRESS"),
        ("temp", "TEMP"),
        ("totam", "TOTAM"),
        ("amount", "AMOUNT"),
        ("pp", "PP"),
        ("cont", "CONT"),
        ("frac", "FRAC"),
        ("laysf", "LAYSF"),
    ],
)
def test_layer_field(layers, golden, field, key):
    got = np.asarray(getattr(layers, field))
    want = golden[key]
    # atol: 1e-18 of the field scale — covers fp noise where the reference has
    # exact zeros (e.g. AMOUNT above a gas's cutoff altitude)
    atol = 1e-18 * np.abs(want).max() if want.size else 0.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol, err_msg=field)


def test_absorption_imod_branch():
    """IMOD=ABSORBTION path dispatch: 1 - exp(-tau) (reference
    calculate_absorption_spectrum ForwardModel_0.py:4127 + CIRSrad
    dispatch :4485)."""
    import jax.numpy as jnp

    from archnemesis_tpu.enums import PathCalc
    from archnemesis_tpu.forward import path_spectrum
    from archnemesis_tpu.rt.path import Paths

    nwave, ng, nlay = 4, 3, 5
    rng = np.random.default_rng(1)
    tau = jnp.asarray(rng.uniform(0.01, 2.0, (nwave, ng, nlay)))
    layinc = jnp.arange(nlay, dtype=jnp.int32)[:, None]
    ones = jnp.ones((nlay, 1))
    zero = jnp.zeros(1)

    def mk(imod):
        return Paths(layinc=layinc, scale=ones * 1.5, emtemp=ones * 100.0,
                     mask=ones, sol_ang=zero, emiss_ang=zero, azi_ang=zero,
                     imod=imod, surface_visible=False)

    class _Cfg:
        gasgiant = True
        ispace = 0

    delg = jnp.full(ng, 1.0 / ng)
    wave = jnp.linspace(600.0, 700.0, nwave)
    tr = path_spectrum(_Cfg, wave, tau, mk(PathCalc(0)), None, delg)
    ab = path_spectrum(_Cfg, wave, tau, mk(PathCalc.ABSORBTION), None, delg)
    np.testing.assert_allclose(np.asarray(ab), 1.0 - np.asarray(tr),
                               rtol=1e-12)
