"""Adding-doubling multiple-scattering core vs the reference oracle.

Golden (tests/goldens/scatter_core.npz, tools/gen_scatter_golden.py): the
reference scloud11wave_core on small synthetic inputs — thermal-only,
sun+thermal, and Lambert surface cases, NF=2 Fourier terms, Rayleigh + one
HG aerosol mode, tau spanning 1e-4..10 (exercising the doubling ladder and
both series/inverse branches).

Parity target: the only intended numerical differences are matmul
association order, so rtol 1e-10 in float64.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.rt.scattering import (
    ScatterQuadrature,
    henyey_greenstein2,
    scloud11wave,
    scloud11wave_tiled,
)

GOLDEN = "tests/goldens/scatter_core.npz"


@pytest.fixture(scope="module")
def d():
    return np.load(GOLDEN)


def _run(d, solar_on, surface):
    quad = ScatterQuadrature(
        mu=tuple(d["MU"]), wtmu=tuple(d["WTMU"]),
        nf=int(d["NF"]), nphi=int(d["NPHI"]),
    )
    nwave = d["vwaves"].shape[0]
    f = jnp.asarray(d["f"])[:, None, None, None]
    g1 = jnp.asarray(d["g1"])[:, None, None, None]
    g2 = jnp.asarray(d["g2"])[:, None, None, None]
    phase_fns = [lambda c: henyey_greenstein2(c[None], f, g1, g2)]

    solar = d["solar"] if solar_on else np.zeros(nwave)
    if surface:
        brdf = np.zeros((nwave, quad.nmu, quad.nmu, quad.nf + 1))
        brdf[..., 0] = 0.3 / np.pi
        brdf = jnp.asarray(brdf)
    else:
        brdf = None

    rad = scloud11wave(
        quad, phase_fns,
        radg=jnp.asarray(d["radg"]),
        sol_ang=jnp.asarray(d["SOL_ANGS"]),
        emiss_ang=jnp.asarray(d["EMISS_ANGS"]),
        azi_ang=jnp.asarray(d["APHIS"]),
        solar=jnp.asarray(solar),
        bnu=jnp.asarray(d["bnu"]),
        taus=jnp.asarray(d["taus"]),
        tauray=jnp.asarray(d["tauray"]),
        tauscat=jnp.asarray(d["tauscat_aero"]),
        lfrac=jnp.asarray(d["lfrac"]),
        iray=True,
        brdf_matrix=brdf,
    )
    return np.asarray(rad)


@pytest.mark.parametrize(
    "key,solar_on,surface",
    [
        ("RAD_thermal", False, False),
        ("RAD_sun", True, False),
        ("RAD_surface_sun", True, True),
    ],
)
def test_scloud11wave_vs_reference(d, key, solar_on, surface):
    got = _run(d, solar_on, surface)
    want = d[key]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=0)


def test_f32_rows_path_matches_golden(d):
    """float32 dispatches to the struct-of-arrays core (flat-batch row
    algebra); it must reproduce the f64 AoS/oracle result to f32 ladder
    accumulation accuracy on all three golden cases."""
    import jax

    quad = ScatterQuadrature(
        mu=tuple(d["MU"]), wtmu=tuple(d["WTMU"]),
        nf=int(d["NF"]), nphi=int(d["NPHI"]),
    )
    nwave = d["vwaves"].shape[0]
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)  # noqa: E731
    f = f32(d["f"])[:, None, None, None]
    g1 = f32(d["g1"])[:, None, None, None]
    g2 = f32(d["g2"])[:, None, None, None]
    phase_fns = [lambda c: henyey_greenstein2(c[None], f, g1, g2)]
    brdf = np.zeros((nwave, quad.nmu, quad.nmu, quad.nf + 1))
    brdf[..., 0] = 0.3 / np.pi

    rad = scloud11wave(
        quad, phase_fns,
        radg=f32(d["radg"]),
        sol_ang=f32(d["SOL_ANGS"]),
        emiss_ang=f32(d["EMISS_ANGS"]),
        azi_ang=f32(d["APHIS"]),
        solar=f32(d["solar"]),
        bnu=f32(d["bnu"]),
        taus=f32(d["taus"]),
        tauray=f32(d["tauray"]),
        tauscat=f32(d["tauscat_aero"]),
        lfrac=f32(d["lfrac"]),
        iray=True,
        brdf_matrix=f32(brdf),
    )
    assert rad.dtype == jnp.float32
    want = d["RAD_surface_sun"]
    np.testing.assert_allclose(
        np.asarray(rad), want, rtol=5e-4,
        atol=np.abs(want).max() * 1e-4,
    )

    # jacfwd flows through the rows ladder (forward-mode, traced bound)
    def loss(ts):
        return scloud11wave(
            quad, phase_fns, f32(d["radg"]), f32(d["SOL_ANGS"]),
            f32(d["EMISS_ANGS"]), f32(d["APHIS"]), f32(d["solar"]),
            f32(d["bnu"]), ts, f32(d["tauray"]), f32(d["tauscat_aero"]),
            f32(d["lfrac"]), True, f32(brdf),
        ).sum()

    g = jax.jacfwd(loss)(f32(d["taus"]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_tiled_matches_untiled(d):
    """Wave-tiled driver == untiled core, including a tile size that does
    NOT divide nwave (padding lanes must be inert) and a BRDF bottom
    layer threaded through every tile."""
    quad = ScatterQuadrature(
        mu=tuple(d["MU"]), wtmu=tuple(d["WTMU"]),
        nf=int(d["NF"]), nphi=int(d["NPHI"]),
    )
    nwave = d["vwaves"].shape[0]
    f = jnp.asarray(d["f"])[:, None, None, None]
    g1 = jnp.asarray(d["g1"])[:, None, None, None]
    g2 = jnp.asarray(d["g2"])[:, None, None, None]
    phase_fns = [lambda c: henyey_greenstein2(c[None], f, g1, g2)]
    brdf = np.zeros((nwave, quad.nmu, quad.nmu, quad.nf + 1))
    brdf[..., 0] = 0.3 / np.pi

    kw = dict(
        radg=jnp.asarray(d["radg"]),
        sol_ang=jnp.asarray(d["SOL_ANGS"]),
        emiss_ang=jnp.asarray(d["EMISS_ANGS"]),
        azi_ang=jnp.asarray(d["APHIS"]),
        solar=jnp.asarray(d["solar"]),
        bnu=jnp.asarray(d["bnu"]),
        taus=jnp.asarray(d["taus"]),
        tauray=jnp.asarray(d["tauray"]),
        tauscat=jnp.asarray(d["tauscat_aero"]),
        lfrac=jnp.asarray(d["lfrac"]),
        iray=True,
        brdf_matrix=jnp.asarray(brdf),
    )
    ref = scloud11wave(quad, phase_fns, **kw)
    tile = max(2, nwave - 1)  # two tiles, second mostly padding
    assert nwave % tile != 0
    got = scloud11wave_tiled(quad, phase_fns, wave_tile=tile, **kw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-12, atol=0
    )
    assert np.all(np.isfinite(np.asarray(got)))


def test_f32_aos_body_matches_f64_at_deck_order(monkeypatch):
    """The f32 AoS body (reachable via the ROWS_NMU_MAX diagnostics
    escape hatch — production f32 always takes the rows core, which is
    34x faster at NMU=10 and the only core that RUNS at NMU=15 on the
    v5e; BASELINE.md A/B) must track f64 to ladder accumulation accuracy
    at a real-deck quadrature order."""
    from archnemesis_tpu.rt import scattering as sc

    monkeypatch.setattr(sc, "ROWS_NMU_MAX", 0)  # force AoS for f32
    nmu = 10
    rng = np.random.default_rng(0)
    nf, nwave, ng, nlay = 2, 4, 2, 6
    mu, wt = np.polynomial.legendre.leggauss(2 * nmu)
    sel = mu > 0
    quad = ScatterQuadrature(
        mu=tuple(mu[sel]), wtmu=tuple(wt[sel]), nf=nf, nphi=100
    )
    f = rng.uniform(0.3, 0.9, nwave)[:, None, None, None]
    g1 = np.full((nwave, 1, 1, 1), 0.6)
    g2 = np.full((nwave, 1, 1, 1), -0.3)
    taus = 10.0 ** rng.uniform(-3, 0.8, (nwave, ng, nlay))
    tausc = np.min(taus, axis=1) * rng.uniform(0.2, 0.7, (nwave, nlay))
    tauray = 0.1 * tausc
    lfrac = np.ones((nwave, 1, nlay))
    bnu = rng.uniform(1e-9, 1e-7, (nwave, nlay))
    radg = rng.uniform(0, 1e-8, (nwave, nmu))
    solar = np.full(nwave, 1e-5)
    ang = dict(sol_ang=jnp.asarray([30.0, 45.0]),
               emiss_ang=jnp.asarray([20.0, 0.0]),
               azi_ang=jnp.asarray([60.0, 0.0]))

    def run(dt):
        pf = [lambda c: henyey_greenstein2(
            c[None], jnp.asarray(f, dt), jnp.asarray(g1, dt),
            jnp.asarray(g2, dt))]
        return np.asarray(scloud11wave(
            quad, pf, radg=jnp.asarray(radg, dt),
            solar=jnp.asarray(solar, dt), bnu=jnp.asarray(bnu, dt),
            taus=jnp.asarray(taus, dt), tauray=jnp.asarray(tauray, dt),
            tauscat=jnp.asarray(tausc, dt), lfrac=jnp.asarray(lfrac, dt),
            iray=True, **ang))

    r64 = run(jnp.float64)
    r32 = run(jnp.float32)
    rel = np.abs(r32.astype(np.float64) - r64) / np.abs(r64).max()
    assert rel.max() < 5e-4, rel.max()
