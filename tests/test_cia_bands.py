"""Analytic NIR CIA bands (CO2-CO2 / N2-N2 / N2-H2) vs the reference
functions (CIA_0.py co2cia:631, n2n2cia:710, n2h2cia:775), and their
wiring into cia_tau (ForwardModel_0.py:4752-4770)."""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.core.spectra import CIATables
from archnemesis_tpu.enums import ParaH2Ratio, WaveUnit
from archnemesis_tpu.ops.cia import AMAGAT, analytic_cia_curves, cia_tau


@pytest.fixture(scope="module")
def ref_cia():
    from tools.refutils import import_reference

    import_reference()
    from archnemesis.CIA_0 import co2cia, n2h2cia, n2n2cia

    return co2cia, n2n2cia, n2h2cia


def test_curves_match_reference(ref_cia):
    co2cia, n2n2cia, n2h2cia = ref_cia
    rng = np.random.default_rng(7)
    # spans the 2.3um table, both N2 bands, the constant CO2 wavelength
    # windows (5682-9434 cm-1), and out-of-band zeros
    waven = np.sort(rng.uniform(3000.0, 10000.0, 4000))
    # pin a few exact knots and window edges
    waven = np.concatenate(
        [waven, [3950.0, 4500.0, 4825.0, 3995.0, 4995.0, 1e4 / 1.76, 1e4 / 1.06]]
    )
    waven.sort()
    k_co2, k_n2n2, k_n2h2 = analytic_cia_curves(jnp.asarray(waven))
    np.testing.assert_allclose(np.asarray(k_co2), co2cia(waven), rtol=1e-12,
                               atol=1e-60)
    np.testing.assert_allclose(np.asarray(k_n2n2), n2n2cia(waven), rtol=1e-12,
                               atol=1e-60)
    np.testing.assert_allclose(np.asarray(k_n2h2), n2h2cia(waven), rtol=1e-12,
                               atol=1e-60)


def test_cia_tau_band_wiring(ref_cia):
    """cia_tau with an empty pair table but CO2/N2/H2 present must produce
    exactly XFAC * (k_co2 q_co2^2 + k_n2n2 q_n2^2 + k_n2h2 q_n2 q_h2)."""
    co2cia, n2n2cia, n2h2cia = ref_cia
    rng = np.random.default_rng(3)
    nlay = 5
    waven = np.linspace(4000.0, 4900.0, 300)
    # 1-pair table with zero cross sections (keeps shapes valid)
    cia = CIATables(
        waven=np.array([10.0, 20000.0]),
        temp=np.array([50.0, 400.0]),
        frac=np.array([0.25]),
        k_cia=np.zeros((1, 1, 2, 2)),
        pair_gas1=(39,),
        pair_gas2=(40,),
        inormalt=(None,),
        npara=0,
        inormal=ParaH2Ratio.EQUILIBRIUM,
    )
    q = rng.uniform(0.01, 0.5, (nlay, 3))  # columns: co2, n2, h2
    temp = rng.uniform(150.0, 300.0, nlay)
    totam = rng.uniform(1e28, 1e30, nlay)  # m-2
    delh = rng.uniform(1e3, 1e4, nlay)  # m

    tau = np.asarray(
        cia_tau(
            cia, jnp.asarray(waven), jnp.asarray(temp),
            jnp.zeros(nlay), jnp.asarray(q), jnp.asarray(totam),
            jnp.asarray(delh), jnp.zeros(1, dtype=int),
            jnp.zeros(1, dtype=int), np.zeros(1),
            ispace=WaveUnit.Wavenumber_cm, ico2=0, in2=1, ih2=2,
        )
    )
    xfac = (totam * 1e-4) ** 2 / (delh * 1e2)
    expect = (
        co2cia(waven)[:, None] * q[None, :, 0] ** 2
        + n2n2cia(waven)[:, None] * q[None, :, 1] ** 2
        + n2h2cia(waven)[:, None] * q[None, :, 1] * q[None, :, 2]
    ) * xfac[None, :]
    np.testing.assert_allclose(tau, expect, rtol=1e-10)


def test_cia_tau_f32_prescaled_matches_f64():
    """The float32 deck path: raw k_cia (~1e-45 cm^5) is subnormal in f32,
    so cast_deck prescales the table by 2**134 host-side and cia_tau
    applies only the residual. The f32 result must track the raw-f64 path
    to f32 precision (a straight f32 cast of the raw table flushes to
    zero / NaN instead)."""
    from archnemesis_tpu.core.spectra import cast_deck

    rng = np.random.default_rng(7)
    nlay, nw = 4, 64
    waven_tab = np.linspace(10.0, 2000.0, 32)
    cia = CIATables(
        waven=waven_tab,
        temp=np.array([50.0, 150.0, 300.0, 400.0]),
        frac=np.array([0.25]),
        k_cia=rng.uniform(0.2e-45, 5e-45, (2, 1, 4, 32)),
        pair_gas1=(39, 39),
        pair_gas2=(39, 40),
        inormalt=(None, None),
        npara=0,
        inormal=ParaH2Ratio.EQUILIBRIUM,
    )
    wave = np.linspace(200.0, 1500.0, nw)
    temp = rng.uniform(80.0, 350.0, nlay)
    q = np.stack([np.full(nlay, 0.86), np.full(nlay, 0.13)], axis=1)
    totam = rng.uniform(1e28, 1e30, nlay)
    delh = rng.uniform(1e3, 1e4, nlay)

    def run(c, dt):
        return np.asarray(
            cia_tau(
                c, jnp.asarray(wave, dt), jnp.asarray(temp, dt),
                jnp.zeros(nlay, dt), jnp.asarray(q, dt),
                jnp.asarray(totam, dt), jnp.asarray(delh, dt),
                ispace=WaveUnit.Wavenumber_cm,
                pair_q1_idx=np.array([0, 0]), pair_q2_idx=np.array([0, 1]),
                pair_active=np.array([1.0, 1.0]),
            )
        )

    ref = run(cia, jnp.float64)
    c32 = cast_deck(cia, np.float32)
    assert c32.k_scale == 2.0**134
    got = run(c32, jnp.float32)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=5e-6)
    # prescale is exact in f64: bit-identical to the raw path
    np.testing.assert_array_equal(run(cia.prescale(), jnp.float64), ref)


def test_cia_tau_f32_unscaled_jit_stays_finite():
    """Regression (r5): with an UNSCALED table in f32, cia_tau's rescue
    multiplies (2**67 half-steps) used to sit as a constant chain on one
    operand; XLA's algebraic simplifier folded them into a single 2**134
    f32 constant = inf, so the jitted spectrum became 0 * inf = NaN while
    the eager product stayed finite.  The steps now alternate between the
    two non-constant factors, which the simplifier cannot fold.  (The
    production fix is the automatic prescale — see
    test_attach_logk_prescales_cia_for_f32 — but partially-scaled tables
    must degrade to zero-CIA, never to NaN.)"""
    import jax

    rng = np.random.default_rng(11)
    nlay, nw = 4, 32
    cia = CIATables(
        waven=np.linspace(10.0, 2000.0, 16),
        temp=np.array([50.0, 400.0]),
        frac=np.array([0.25]),
        k_cia=rng.uniform(0.2e-45, 5e-45, (1, 1, 2, 16)),
        pair_gas1=(39,), pair_gas2=(39,), inormalt=(None,),
        npara=0, inormal=ParaH2Ratio.EQUILIBRIUM,
    )
    wave = np.linspace(200.0, 1500.0, nw)
    temp = rng.uniform(80.0, 350.0, nlay)
    q = np.full((nlay, 1), 0.86)
    totam = rng.uniform(1e28, 1e30, nlay)
    delh = rng.uniform(1e3, 1e4, nlay)

    def f32_run(k32):
        # k_scale=1.0 (unscaled) with an f32 table: subnormal quantization
        c = cia.replace(k_cia=k32)
        return cia_tau(
            c, jnp.asarray(wave, jnp.float32),
            jnp.asarray(temp, jnp.float32),
            jnp.zeros(nlay, jnp.float32),
            jnp.asarray(q, jnp.float32),
            jnp.asarray(totam, jnp.float32),
            jnp.asarray(delh, jnp.float32),
            ispace=WaveUnit.Wavenumber_cm,
            pair_q1_idx=np.array([0]), pair_q2_idx=np.array([0]),
            pair_active=np.array([1.0]),
        )

    k32 = jnp.asarray(cia.k_cia, jnp.float32)
    out = np.asarray(jax.jit(f32_run)(k32))
    assert np.isfinite(out).all(), "jitted unscaled-f32 CIA went non-finite"


def test_attach_logk_prescales_cia_for_f32():
    """_attach_logk is every setup builder's f32 preparation hook: under a
    non-x64 config it must BOTH attach the host-f64 log-k table and
    prescale the CIA table (raw ~1e-45 cm^5 values are subnormal in f32 —
    without the prescale a TPU run silently loses all CIA opacity, and
    the jitted rescue path NaNs; found live in r5 via bench_retrieval)."""
    import jax

    from archnemesis_tpu.io.legacy import load_deck
    from archnemesis_tpu.retrievals import _attach_logk

    deck = load_deck("tests/fixtures/jupiter_fdret", "cirstest")
    assert deck.cia is not None and deck.cia.k_scale == 1.0

    # x64 runs leave the deck untouched (f64 path is the parity oracle)
    out64 = _attach_logk(deck)
    assert out64.cia.k_scale == 1.0

    jax.config.update("jax_enable_x64", False)
    try:
        out32 = _attach_logk(deck)
    finally:
        jax.config.update("jax_enable_x64", True)
    assert out32.cia.k_scale == 2.0**134
    assert np.isfinite(np.asarray(out32.cia.k_cia)).all()
    assert getattr(out32.ktables, "logk", None) is not None
