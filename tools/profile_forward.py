"""Stage-by-stage timing of the bench forward model on the attached TPU.

Usage: python tools/profile_forward.py [nwave]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, nrep=3):
    out = fn(*args)
    _ = float(np.asarray(jax_sum(out)))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    _ = float(np.asarray(jax_sum(out)))
    return (time.perf_counter() - t0) / nrep


def jax_sum(x):
    import jax
    import jax.numpy as jnp

    leaves = [v for v in jax.tree.leaves(x)
              if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)]
    return sum(jnp.sum(v) for v in leaves)


def main():
    import jax
    import jax.numpy as jnp

    nwave = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    from archnemesis_tpu.core.spectra import KTables, SurfaceSpec
    from archnemesis_tpu.core.types import Atmosphere, LayerConfig
    from archnemesis_tpu.enums import RayleighScatteringMode, WaveUnit
    from archnemesis_tpu.forward import (
        apply_dust_renorm,
        forward_nadir,
        layer_optical_depths,
        make_forward_config,
        path_spectrum,
    )
    from archnemesis_tpu.ops.ktab import interp_ktables
    from archnemesis_tpu.ops.overlap import mix_gas_k
    from archnemesis_tpu.rt.layer import build_layers
    from archnemesis_tpu.rt.path import nadir_path
    from archnemesis_tpu.enums import PathCalc

    dtype = np.float32
    ng, nlay, npro, ngas = 20, 71, 81, 7

    rng = np.random.default_rng(0)
    h = np.linspace(-8.0e4, 4.0e5, npro)
    p = 1.0e6 * np.exp(-(h - h[0]) / 4.0e4)
    t = 165.0 + 140.0 * np.exp(-(h - h[0]) / 1.2e5)
    vmr = np.concatenate(
        [np.full((npro, 1), 0.86), np.full((npro, 1), 0.13),
         np.full((npro, 5), 2.0e-3)], axis=1)
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
    k = (2e-22 * band[None, :, None, None, None]
         * np.exp(2.5 * (g_ord - 0.7))[None, None, :, None, None]
         * (press_grid / press_grid.max())[None, None, None, :, None] ** 0.15
         * (temp_grid / 150.0)[None, None, None, None, :] ** -0.5
         * np.ones((ngas, 1, 1, 1, 1)))
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
        galb=np.asarray(0.0, dtype=dtype), gasgiant=True,
    )
    cfg = make_forward_config(
        atm, ktab, None, iray=RayleighScatteringMode.GAS_GIANT_ATM,
        ispace=WaveUnit.Wavenumber_cm, gasgiant=True,
    )

    atm = jax.device_put(atm)
    ktab = jax.device_put(ktab)

    ATM_TO_PA = 101325.0
    SQ_CM_TO_SQ_M = 1.0e-4

    # precompute layers on device for stage timing
    layers = jax.jit(lambda a: build_layers(a, laycfg, layang=0.0))(atm)
    press_atm = layers.press / ATM_TO_PA
    amounts = layers.amount[:, jnp.asarray(cfg.spec_gas_idx)].T * SQ_CM_TO_SQ_M

    f_layers = jax.jit(lambda a: build_layers(a, laycfg, layang=0.0))
    f_interp = jax.jit(lambda kt, pa, tl: interp_ktables(kt.k, kt.press, kt.temp, pa, tl))
    k_gas = f_interp(ktab, press_atm, layers.temp)
    f_mix = jax.jit(lambda kg, am: mix_gas_k(cfg.del_g_np, kg, am, nstraddle=cfg.nstraddle))
    taugas = f_mix(k_gas, amounts)

    f_taus = jax.jit(lambda a, kt, ly: layer_optical_depths(cfg, ly, kt.wave, kt, None, None))
    taus = f_taus(atm, ktab, layers)

    path = nadir_path(layers, atm.radius, atm.h[-1], 0.0,
                      imod=PathCalc.THERMAL_EMISSION)
    f_spec = jax.jit(lambda w, tt, ly: path_spectrum(
        cfg, w, tt, nadir_path(ly, atm.radius, atm.h[-1], 0.0,
                               imod=PathCalc.THERMAL_EMISSION),
        surf, ktab.del_g))

    f_full = jax.jit(lambda a, kt: forward_nadir(
        a, laycfg, kt, None, None, surf, cfg, emiss_ang=0.0))

    print(f"nwave={nwave} ng={ng} nlay={nlay} ngas={ngas}")
    for name, fn, args in [
        ("build_layers", f_layers, (atm,)),
        ("interp_ktables", f_interp, (ktab, press_atm, layers.temp)),
        ("mix_gas_k", f_mix, (k_gas, amounts)),
        ("layer_optical_depths", f_taus, (atm, ktab, layers)),
        ("path_spectrum", f_spec, (ktab.wave, taus["tautot"], layers)),
        ("forward_nadir (full)", f_full, (atm, ktab)),
    ]:
        dt = timeit(fn, *args)
        print(f"  {name:28s} {dt*1e3:9.2f} ms   {nwave/dt:12.0f} gridpoints/s")


if __name__ == "__main__":
    main()
