"""A/B the f32 adding-doubling cores at real-deck quadrature orders.

Real decks run NMU=10-21 (reference .set, Files.py:1269) while the bench
shape uses NMU=5.  The struct-of-arrays (rows) core unrolls the nmu x nmu
algebra at trace time (~nmu^3 scalar HLOs per primitive), so its compile
cost grows steeply with order; the AoS core's (8,128)-register-tile
padding waste shrinks with order ((8*128)/nmu^2).  This tool measures
BOTH cores' compile wall and steady-state throughput at a given NMU on
the real chip, which sets rt.scattering.ROWS_NMU_MAX.

Usage: python tools/bench_scattering_nmu.py [NMU] [NWAVE]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(nmu: int, nwave: int, which: str, wave_tile: int = 128):
    import jax
    import jax.numpy as jnp

    from archnemesis_tpu.rt import scattering as sc

    sc_max = sc.ROWS_NMU_MAX
    sc.ROWS_NMU_MAX = 99 if which == "rows" else 0
    try:
        # scenario mirrors tests/test_scattering.py::
        # test_f32_aos_body_matches_f64_at_deck_order — keep in sync
        rng = np.random.default_rng(0)
        nf, ng, nlay, npath = 2, 10, 39, 1
        dt = jnp.float32
        mu, wt = np.polynomial.legendre.leggauss(2 * nmu)
        sel = mu > 0
        quad = sc.ScatterQuadrature(
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

        pf = [lambda c: sc.henyey_greenstein2(
            c[None], jnp.asarray(f, dt), jnp.asarray(g1, dt),
            jnp.asarray(g2, dt))]
        args = dict(
            radg=jnp.asarray(radg, dt), solar=jnp.asarray(solar, dt),
            bnu=jnp.asarray(bnu, dt), taus=jnp.asarray(taus, dt),
            tauray=jnp.asarray(tauray, dt), tauscat=jnp.asarray(tausc, dt),
            lfrac=jnp.asarray(lfrac, dt),
            sol_ang=jnp.asarray([45.0]), emiss_ang=jnp.asarray([30.0]),
            azi_ang=jnp.asarray([60.0]),
        )
        fwd = jax.jit(lambda a: sc.scloud11wave_tiled(
            quad, pf, iray=True, wave_tile=wave_tile, **a))
        t0 = time.perf_counter()
        out = fwd(args)
        _ = float(np.asarray(out).sum())
        t_compile = time.perf_counter() - t0
        nrep = 3
        t0 = time.perf_counter()
        for _ in range(nrep):
            out = fwd(args)
        chk = float(np.asarray(out).sum())
        dt_run = (time.perf_counter() - t0) / nrep
        assert np.isfinite(chk)
        print(f"nmu={nmu} {which:4s} tile={wave_tile}: "
              f"compile+first {t_compile:7.1f} s, "
              f"steady {dt_run*1e3:8.1f} ms = {nwave/dt_run:8.1f} gp/s",
              flush=True)
        return nwave / dt_run
    finally:
        sc.ROWS_NMU_MAX = sc_max


if __name__ == "__main__":
    nmu = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    nwave = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    whichs = sys.argv[3].split(",") if len(sys.argv) > 3 else ["aos", "rows"]
    tile = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    for which in whichs:
        run(nmu, nwave, which, wave_tile=tile)
