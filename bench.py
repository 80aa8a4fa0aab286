"""Benchmark: correlated-k nadir thermal-emission forward model throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: wavenumber-gridpoints/s/chip through the full forward model
(k-interpolation + 7-gas random-overlap mixing + CIA + Rayleigh + thermal
emission RT) on a Jupiter-like problem in float32, on whatever backend JAX
selects (the real TPU chip under the driver).

vs_baseline: ratio to the reference implementation's throughput on this
machine's CPU. The reference is pure Python+numba; numba is unavailable in
this image, so the baseline constant below was measured by running the
reference's forward model via the numba stub (pure Python) on this host and
multiplying by 50x as a generous allowance for numba's typical speedup —
documented in BASELINE.md.
"""

import json
import time

import numpy as np


# Reference-oracle measurement (this host, pure-Python, Jupiter deck:
# 559 waves x 20 g x 71 layers forward model): ~40 s/eval -> 14 gridpoints/s.
# x50 numba allowance -> 700 gridpoints/s/CPU assumed for the baseline.
BASELINE_GRIDPOINTS_PER_S_CPU = 700.0


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
    ktab = KTables(
        wave=wave.astype(dtype), g_ord=g_ord.astype(dtype),
        del_g=del_g.astype(dtype), press=press_grid.astype(dtype),
        temp=temp_grid.astype(dtype), k=k.astype(dtype),
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
    print(
        json.dumps(
            {
                "metric": "wavenumber-gridpoints/s/chip (correlated-k nadir forward)",
                "value": round(gridpoints_per_s, 1),
                "unit": "gridpoints/s",
                "vs_baseline": round(
                    gridpoints_per_s / BASELINE_GRIDPOINTS_PER_S_CPU, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
