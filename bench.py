"""Benchmark: forward-model throughput on the three driver-defined kernels.

Prints ONE JSON line. Headline metric (continuity with earlier rounds):
wavenumber-gridpoints/s/chip through the correlated-k nadir thermal
forward (k-interpolation + 7-gas random-overlap mixing + CIA + Rayleigh +
thermal emission RT), float32. The JSON tail adds the two other
driver-defined kernels (BASELINE.json: "LBL + scattering"):

- ``lbl_gridpoints_per_s``: runtime line-by-line Voigt synthesis (Pallas
  kernel on TPU) through the same nadir RT chain — 80k waves at 1 mK
  resolution, ~15k lines, 40 layers;
- ``scattering_gridpoints_per_s``: nadir multiple-scattering forward
  (adding–doubling core, NMU=5, NF=2, HG aerosol + Rayleigh + solar)
  at 2048 waves x 10 g x 39 layers, wave-tiled (lax.map over 128-wave
  tiles, rt/scattering.scloud11wave_tiled) so the per-tile working set
  stays core-resident (measured optimum, BASELINE.md) — the production
  path for LBL-resolution scattering grids;
- ``retrieval_wallclock_s``: full OE retrieval (3 LM iterations, jacfwd
  Jacobians) on the real reduced Jupiter deck, incl. parse + compile;
- ``fm_evals_per_s``: the headline workload as a whole-forward rate
  (one eval = one full 8192-wave correlated-k nadir forward).

vs_baseline: ratio to the reference implementation's throughput on this
machine's CPU. The reference is pure Python+numba; numba is unavailable in
this image, so the baseline is anchored two ways (BASELINE.md):
1. pure-Python reference forward measured on this host: 14 gridpoints/s;
2. the DOMINANT reference kernel (rankg random overlap: argsort of 400
   weighted opacity products + g-CDF rebin, x 6 pair-mixes x 71 layers
   per gridpoint) re-timed in numpy's compiled-C sort — a fair proxy for
   numba-compiled throughput: 8.4 ms/gridpoint = 120 gridpoints/s/core
   measured (tools/bench_cpu_anchor.py), EXCLUDING k-interp/CIA/RT.
The 700 gridpoints/s constant below is therefore a deliberately GENEROUS
multi-core allowance (~6 fast cores of overlap-stage-only throughput);
every vs_baseline number here understates the true speedup.
"""

import json
import sys
import time

import numpy as np


def _log(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


# See module docstring: measured anchors are 14 gp/s (pure Python, whole
# forward) and 120 gp/s/core (compiled-C rankg stage alone); 700 is the
# retained generous multi-core allowance.
BASELINE_GRIDPOINTS_PER_S_CPU = 700.0


def _time_reps(fn, args, nrep=3):
    """Median-free simple timing: warmup+compile, then nrep reps fenced by a
    host readback (block_until_ready is unreliable on the axon backend)."""
    out = fn(*args)
    _ = float(np.asarray(out).sum())  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    checksum = float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / nrep
    assert np.isfinite(checksum), "non-finite forward output"
    return dt


def bench_lbl():
    """Runtime-LBL nadir forward: Pallas Voigt synthesis at production
    resolution (80k waves at 0.001 cm^-1, ~15k lines, 40 layers)."""
    import dataclasses

    import jax

    from archnemesis_tpu.core.spectra import SurfaceSpec
    from archnemesis_tpu.core.types import Atmosphere, LayerConfig
    from archnemesis_tpu.enums import RayleighScatteringMode, WaveUnit
    from archnemesis_tpu.forward import forward_nadir, make_forward_config
    from archnemesis_tpu.io.linedata import read_lls_runtime

    dtype = np.float32
    nwave, nlay, npro = 80_000, 40, 41

    rt = read_lls_runtime("tests/fixtures/co_runtime/cirstest.lls")
    ll = rt.line_lists[0]
    # tile the CO band's lines to a CH4-like density (~15k lines over
    # 80 cm^-1) with jittered centres — the bench measures kernel
    # throughput at a stated (lines, waves) shape, not CO physics
    rng = np.random.default_rng(1)
    reps = 60
    nu = np.concatenate(
        [ll.nu + rng.uniform(-20.0, 20.0) for _ in range(reps)]
    )
    order = np.argsort(nu)
    tile = lambda a: np.concatenate([a] * reps)[order]  # noqa: E731
    ll = dataclasses.replace(
        ll, nu=nu[order], sw=tile(ll.sw) / reps, elower=tile(ll.elower),
        stim_ref=tile(ll.stim_ref),
        broad=np.stack([tile(ll.broad[i]) for i in range(6)]),
    )
    wave = np.arange(2110.0, 2190.0, 0.001)[:nwave]
    rt = dataclasses.replace(rt, wave=wave, line_lists=(ll,))
    rt = rt.windowed(2100.0, 2200.0)

    h = np.linspace(0.0, 8.0e4, npro)
    p = 700.0 * np.exp(-h / 1.1e4)
    t = 210.0 - 60.0 * (h / 8.0e4)
    vmr = np.concatenate(
        [np.full((npro, 1), 8.0e-4), np.full((npro, 1), 0.95)], axis=1
    )
    atm = Atmosphere(
        h=h.astype(dtype), p=p.astype(dtype), t=t.astype(dtype),
        vmr=vmr.astype(dtype), dust=np.zeros((npro, 0), dtype=dtype),
        parah2=np.zeros(npro, dtype=dtype),
        molwt=np.full(npro, 43.5e-3, dtype=dtype),
        radius=np.asarray(3.39e6, dtype=dtype),
        latitude=np.asarray(0.0, dtype=dtype),
        gas_id=(5, 2), iso_id=(1, 0), planet=4,
    )
    laycfg = LayerConfig(nlay=nlay, laytyp=1, layint=1, layht=0.0)
    surf = SurfaceSpec(
        tsurf=np.asarray(0.0, dtype=dtype),
        vem=np.array([0.0, 1e5], dtype=dtype),
        emissivity=np.zeros(2, dtype=dtype),
        galb=np.asarray(0.0, dtype=dtype), gasgiant=True,
    )
    cfg = make_forward_config(
        atm, rt, None, iray=RayleighScatteringMode.NOT_INCLUDED,
        ispace=WaveUnit.Wavenumber_cm, gasgiant=True,
    )
    fwd = jax.jit(
        lambda a: forward_nadir(a, laycfg, rt, None, None, surf, cfg,
                                emiss_ang=0.0)
    )
    atm = jax.device_put(atm)
    dt = _time_reps(fwd, (atm,))
    return nwave / dt, dict(nwave=nwave, nlines=int(ll.nu.size), nlay=nlay)


def bench_retrieval():
    """Full OE retrieval wall-clock on the real (reduced) Jupiter CIRS
    nadir deck (tests/fixtures/jupiter_fdret): make_retrieval_setup +
    3 LM iterations with a fresh jacfwd Jacobian each — the reference's
    coreretOE workload (OptimalEstimation_0.py:1173).  Wall-clock INCLUDES
    deck parsing and XLA compile (a user's single-retrieval latency); the
    per-iteration rate after compile is what amortizes over survey-scale
    retrieval batches."""
    import shutil
    import tempfile

    from archnemesis_tpu.retrievals import run_retrieval

    tmp = tempfile.mkdtemp(prefix="benchret_")
    try:
        deck = f"{tmp}/deck"
        shutil.copytree("tests/fixtures/jupiter_fdret", deck)
        shutil.copytree("tests/fixtures/ktables", f"{tmp}/ktables")
        t0 = time.perf_counter()
        _, res = run_retrieval(deck, "cirstest", niter=3, philimit=0.001)
        wall = time.perf_counter() - t0
        assert np.isfinite(float(res.phi)), "non-finite phi"
        return wall, int(res.n_iter)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_scattering(atm, ktab10, laycfg_headline, surf):
    """Nadir multiple-scattering forward: adding–doubling core at NMU=5,
    NF=2, NPHI=100 with a 2-mode HG aerosol + Rayleigh + solar, 39 layers."""
    import jax

    from archnemesis_tpu.core.types import LayerConfig

    from archnemesis_tpu.core.spectra import AerosolOptics, StellarSpec
    from archnemesis_tpu.enums import RayleighScatteringMode, WaveUnit
    from archnemesis_tpu.forward import (
        forward_scattering_nadir,
        make_forward_config,
    )
    from archnemesis_tpu.rt.scattering import ScatterQuadrature

    dtype = np.float32
    nwave = int(np.asarray(ktab10.wave).shape[0])
    npro = atm.h.shape[0]
    laycfg = LayerConfig(nlay=39, laytyp=laycfg_headline.laytyp,
                         layint=laycfg_headline.layint,
                         layht=laycfg_headline.layht)

    dust = np.exp(
        -0.5 * ((np.linspace(0, 1, npro) - 0.4) / 0.15) ** 2
    ).astype(dtype)
    atm = atm.replace(dust=np.stack([dust, 0.5 * dust], axis=1))
    wgrid = np.asarray(ktab10.wave, dtype=dtype)
    aero = AerosolOptics(
        wave=wgrid,
        kext=np.stack(
            [1e-4 * (wgrid / wgrid[0]) ** -0.5,
             2e-4 * (wgrid / wgrid[0]) ** -1.0], axis=1
        ).astype(dtype),
        ksca=np.stack(
            [0.9e-4 * (wgrid / wgrid[0]) ** -0.5,
             1.2e-4 * (wgrid / wgrid[0]) ** -1.0], axis=1
        ).astype(dtype),
    )
    hgphase = (
        wgrid,
        np.full((nwave, 2), 0.7, dtype=dtype),  # f
        np.full((nwave, 2), 0.6, dtype=dtype),  # g1
        np.full((nwave, 2), -0.3, dtype=dtype),  # g2
    )
    stellar = StellarSpec(
        wave=wgrid, solspec=np.full(nwave, 1.0e15, dtype=dtype),
        dist=np.asarray(5.2, dtype=dtype),
        radius=np.asarray(6.96e8, dtype=dtype),
        solexist=True, ispace=0,
    )
    mu, wt = np.polynomial.legendre.leggauss(2 * 5)
    sel = mu > 0
    quad = ScatterQuadrature(
        mu=tuple(mu[sel]), wtmu=tuple(wt[sel]), nf=2, nphi=100
    )
    cfg = make_forward_config(
        atm, ktab10, None, iray=RayleighScatteringMode.GAS_GIANT_ATM,
        ispace=WaveUnit.Wavenumber_cm, gasgiant=True,
    )
    fwd = jax.jit(
        lambda a, kt: forward_scattering_nadir(
            a, laycfg, kt, None, aero, surf, stellar, cfg, quad, hgphase,
            emiss_ang=30.0, sol_ang=45.0, azi_ang=60.0, iray_phase=True,
        )
    )
    atm = jax.device_put(atm)
    ktab10 = jax.device_put(ktab10)
    dt = _time_reps(fwd, (atm, ktab10))
    return nwave / dt, dict(nwave=nwave, nmu=5, nf=2, ng=10,
                            wave_tile=int(cfg.scat_wave_tile))


def main():
    import jax
    import jax.numpy as jnp

    from archnemesis_tpu.core.spectra import KTables, SurfaceSpec
    from archnemesis_tpu.core.types import Atmosphere, LayerConfig
    from archnemesis_tpu.enums import RayleighScatteringMode, WaveUnit
    from archnemesis_tpu.forward import forward_nadir, make_forward_config

    dtype = np.float32
    nwave, ng, nlay, npro, ngas = 8192, 20, 71, 81, 7

    rng = np.random.default_rng(0)
    h = np.linspace(-8.0e4, 4.0e5, npro)
    p = 1.0e6 * np.exp(-(h - h[0]) / 4.0e4)
    t = 165.0 + 140.0 * np.exp(-(h - h[0]) / 1.2e5)
    vmr = np.concatenate(
        [
            np.full((npro, 1), 0.86),
            np.full((npro, 1), 0.13),
            np.full((npro, 5), 2.0e-3),
        ],
        axis=1,
    )
    gas_ids = (39, 40, 26, 27, 6, 28, 11)
    iso_ids = (0, 0, 0, 0, 1, 0, 0)
    atm = Atmosphere(
        h=h.astype(dtype), p=p.astype(dtype), t=t.astype(dtype),
        vmr=vmr.astype(dtype), dust=np.zeros((npro, 0), dtype=dtype),
        parah2=np.zeros(npro, dtype=dtype),
        molwt=np.full(npro, 2.3e-3, dtype=dtype),
        radius=np.asarray(7.1492e7, dtype=dtype),
        latitude=np.asarray(0.0, dtype=dtype),
        gas_id=gas_ids, iso_id=iso_ids, planet=5,
    )
    laycfg = LayerConfig(nlay=nlay, laytyp=1, layint=1, layht=float(h[0]))

    x, w = np.polynomial.legendre.leggauss(ng)
    g_ord, del_g = 0.5 * (x + 1), 0.5 * w
    wave = np.linspace(5.0, 1500.0, nwave)
    press_grid = np.logspace(-8, np.log10(20.0), 15)
    temp_grid = np.linspace(70.0, 400.0, 12)
    band = 1e-4 + np.exp(-0.5 * ((wave[:, None] - rng.uniform(100, 1400, 8)[None, :]) / 80.0) ** 2).sum(1)
    k = (
        2e-22
        * band[None, :, None, None, None]
        * np.exp(2.5 * (g_ord - 0.7))[None, None, :, None, None]
        * (press_grid / press_grid.max())[None, None, None, :, None] ** 0.15
        * (temp_grid / 150.0)[None, None, None, None, :] ** -0.5
        * np.ones((ngas, 1, 1, 1, 1))
    )
    from archnemesis_tpu.ops.ktab import host_log_ktable

    ktab = KTables(
        wave=wave.astype(dtype), g_ord=g_ord.astype(dtype),
        del_g=del_g.astype(dtype), press=press_grid.astype(dtype),
        temp=temp_grid.astype(dtype), k=k.astype(dtype),
        logk=host_log_ktable(k),
        gas_id=gas_ids, iso_id=iso_ids,
    )
    surf = SurfaceSpec(
        tsurf=np.asarray(0.0, dtype=dtype),
        vem=np.array([0.0, 1e5], dtype=dtype),
        emissivity=np.zeros(2, dtype=dtype),
        galb=np.asarray(0.0, dtype=dtype),
        gasgiant=True,
    )
    cfg = make_forward_config(
        atm, ktab, None, iray=RayleighScatteringMode.GAS_GIANT_ATM,
        ispace=WaveUnit.Wavenumber_cm, gasgiant=True,
    )

    _log("headline: compiling + transferring tables")
    fwd = jax.jit(
        lambda a, kt: forward_nadir(a, laycfg, kt, None, None, surf, cfg, emiss_ang=0.0)
    )

    # tables/profiles are HBM-resident in production: place them on device
    # once so the timing measures compute, not host->device transfer over
    # the axon tunnel
    atm = jax.device_put(atm)
    ktab = jax.device_put(ktab)
    out = fwd(atm, ktab)
    # NOTE: block_until_ready does not reliably wait on the remote-TPU
    # "axon" backend; a host readback of a device-computed scalar is the
    # only sync that provably covers execution. In-order program execution
    # means reading the last rep's result fences all previous reps.
    _ = float(out.sum())  # compile + warmup

    nrep = 3
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fwd(atm, ktab)
    checksum = float(out.sum())
    dt = (time.perf_counter() - t0) / nrep
    assert np.isfinite(checksum), "non-finite forward output"

    gridpoints_per_s = nwave / dt
    _log(f"headline done: {gridpoints_per_s:.0f} gp/s")

    # --- driver-defined kernels: runtime LBL + multiple scattering
    _log("lbl stage")
    lbl_gps, lbl_shape = bench_lbl()
    _log(f"lbl done: {lbl_gps:.0f} gp/s")

    # production shape: 2048 waves through the wave-tiled driver (lax.map
    # over cfg.scat_wave_tile=128-wave tiles keeps the live R/T/J stacks
    # at tile size; untiled 2048 waves needs 32G on a 16G v5e)
    ng_s, nwave_s = 10, 2048
    xs, ws = np.polynomial.legendre.leggauss(ng_s)
    g10, dg10 = 0.5 * (xs + 1), 0.5 * ws
    ktab10 = KTables(
        wave=wave[:nwave_s].astype(dtype), g_ord=g10.astype(dtype),
        del_g=dg10.astype(dtype), press=press_grid.astype(dtype),
        temp=temp_grid.astype(dtype),
        k=np.ascontiguousarray(k[:, :nwave_s, :ng_s]).astype(dtype),
        logk=host_log_ktable(np.ascontiguousarray(k[:, :nwave_s, :ng_s])),
        gas_id=gas_ids, iso_id=iso_ids,
    )
    _log("scattering stage")
    # free the headline/LBL device residue before the scattering compile
    # (the R/T/J stacks need most of HBM)
    del out
    atm_s = atm
    atm = ktab = None
    jax.clear_caches()
    scat_gps, scat_shape = bench_scattering(atm_s, ktab10, laycfg, surf)
    _log(f"scattering done: {scat_gps:.0f} gp/s")

    # third driver metric: retrieval wall-clock (real reduced Jupiter deck,
    # 3 LM iterations, fresh jacfwd K each, incl. deck parse + compile)
    _log("retrieval wall-clock stage")
    jax.clear_caches()
    try:
        ret_wall, ret_iters = bench_retrieval()
        _log(f"retrieval done: {ret_wall:.1f} s / {ret_iters} iterations")
    except Exception as e:  # keep the three kernel metrics if this breaks
        _log(f"retrieval stage failed: {e!r}")
        ret_wall, ret_iters = None, None

    print(
        json.dumps(
            {
                "metric": "wavenumber-gridpoints/s/chip (correlated-k nadir forward)",
                "value": round(gridpoints_per_s, 1),
                "unit": "gridpoints/s",
                "vs_baseline": round(
                    gridpoints_per_s / BASELINE_GRIDPOINTS_PER_S_CPU, 2
                ),
                # same headline workload expressed as whole-forward rate
                # (one eval = the full 8192-wave correlated-k forward)
                "fm_evals_per_s": round(1.0 / dt, 3),
                "lbl_gridpoints_per_s": round(lbl_gps, 1),
                "lbl_shape": lbl_shape,
                "scattering_gridpoints_per_s": round(scat_gps, 1),
                "scattering_shape": scat_shape,
                "retrieval_wallclock_s": (
                    None if ret_wall is None else round(ret_wall, 1)
                ),
                "retrieval_iterations": ret_iters,
            }
        )
    )


if __name__ == "__main__":
    main()
