"""Stage-level roofline profiling of the adding-doubling scattering core
(real TPU, f32, one production 256-wave tile of the bench shape).

Times layer_rtj (doubling ladder), combine_path (layer adding scan), and
microbenchmarks of the two primitive batched ops (5x5 matmul, 5x5
Gauss-Jordan inverse) at the ladder's batch size, then derives where the
stage sits against MXU/VPU/HBM limits.  Feeds BASELINE.md's scattering
roofline section.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, nrep=5):
    import jax

    def sync(o):
        return sum(
            float(np.asarray(x).ravel()[:8].sum())
            for x in jax.tree.leaves(o)
        )

    out = fn(*args)
    _ = sync(out)
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    _ = sync(out)
    return (time.perf_counter() - t0) / nrep


def main():
    import jax
    import jax.numpy as jnp

    from archnemesis_tpu.rt import scattering as sc

    nc, nwave, ng, nlay, nmu, ncont = 3, 256, 10, 39, 5, 2
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} shape: nc={nc} nwave={nwave} "
          f"ng={ng} nlay={nlay} nmu={nmu}", flush=True)

    bshape = (nc, nwave, ng, nlay)
    B = int(np.prod(bshape))
    taut = jnp.asarray(
        10.0 ** rng.uniform(-4, 1, bshape), dtype)
    tauscat = taut * jnp.asarray(rng.uniform(0.1, 0.9, bshape), dtype)
    tauray = 0.1 * tauscat
    bc = jnp.asarray(rng.uniform(1e-9, 1e-7, bshape), dtype)
    frac = jnp.asarray(rng.dirichlet([1.0] * ncont, bshape), dtype)
    ppln = jnp.asarray(rng.uniform(0, 0.3, bshape + (ncont, nmu, nmu)), dtype)
    pmin = jnp.asarray(rng.uniform(0, 0.3, bshape + (ncont, nmu, nmu)), dtype)
    pplr = jnp.asarray(rng.uniform(0, 0.3, bshape + (nmu, nmu)), dtype)
    pmir = jnp.asarray(rng.uniform(0, 0.3, bshape + (nmu, nmu)), dtype)
    mu, wt = np.polynomial.legendre.leggauss(2 * nmu)
    sel = mu > 0
    cc = jnp.asarray(wt[sel], dtype)
    mminv = jnp.asarray(1.0 / mu[sel], dtype)
    j_on = jnp.ones((nc, 1, 1, 1), dtype)
    con = jnp.full((nc, 1, 1, 1), 2.0, dtype)

    f = jax.jit(lambda *a: sc.layer_rtj(*a, cc, mminv, j_on, con))
    dt = timeit(f, taut, tauscat, tauray, bc, frac, ppln, pmin, pplr, pmir)
    print(f"layer_rtj (doubling ladder, batch {B}): {dt*1e3:.1f} ms",
          flush=True)

    rl = jnp.asarray(rng.uniform(0, 0.2, (nlay, nc, nwave, ng, nmu, nmu)), dtype)
    tl = jnp.asarray(rng.uniform(0, 0.6, (nlay, nc, nwave, ng, nmu, nmu)), dtype)
    jl = jnp.asarray(rng.uniform(0, 1e-8, (nlay, nc, nwave, ng, nmu, 1)), dtype)
    jp = j_on[:, :, :, :, None]
    g = jax.jit(lambda a, b, c: sc.combine_path(a, b, c, jp))
    dt_c = timeit(g, rl, tl, jl)
    print(f"combine_path ({nlay}-step scan, batch {B//nlay}): "
          f"{dt_c*1e3:.1f} ms", flush=True)

    # primitive microbenches at ladder batch size — CHAIN = 50 dependent
    # iterations inside ONE jit so the axon per-call RPC (~65 ms) and any
    # fixed dispatch cost amortize out; reported time is per iteration.
    CHAIN = 50
    a = jnp.asarray(rng.standard_normal((B, nmu, nmu)) * 0.1, dtype)
    b = jnp.asarray(rng.standard_normal((B, nmu, nmu)) * 0.1, dtype)

    def chain(op):
        def run(x, y):
            def body(_, xy):
                x, y = xy
                return (op(x, y), x)
            return jax.lax.fori_loop(0, CHAIN, body, (x, y))[0]
        return jax.jit(run)

    dt_mm = timeit(chain(lambda x, y: x @ y), a, b) / CHAIN
    flops = B * 2 * nmu**3
    logical = 3 * B * nmu * nmu * 4
    print(f"batched matmul ({B}x{nmu}x{nmu}): {dt_mm*1e3:.2f} ms/op  "
          f"{flops/dt_mm/1e9:.1f} Gflop/s  "
          f"logical bytes {logical/1e6:.0f} MB -> {logical/dt_mm/1e9:.0f} GB/s",
          flush=True)

    eye = jnp.eye(nmu, dtype=dtype)
    dt_inv = timeit(chain(lambda x, y: sc._inv_small(eye + 0.1 * x)), a, b) / CHAIN
    print(f"batched 5x5 Gauss-Jordan inverse: {dt_inv*1e3:.2f} ms/op",
          flush=True)

    dt_ew = timeit(chain(lambda x, y: x * y + 1.0), a, b) / CHAIN
    print(f"elementwise mul-add on same arrays: {dt_ew*1e3:.2f} ms/op  "
          f"{logical/dt_ew/1e9:.0f} GB/s", flush=True)

    # ladder cost model: per iteration ~6 matmuls + 1 inverse + ~10
    # elementwise passes over (B,5,5)
    nn_est = 20
    model = nn_est * (6 * dt_mm + dt_inv + 10 * dt_ew / 3)
    print(f"ladder model ({nn_est} iters x [6 matmul + inv + elementwise]): "
          f"{model*1e3:.0f} ms vs measured {dt*1e3:.0f} ms", flush=True)


def rows_core_profile():
    """Measure the struct-of-arrays f32 core at the bench tile shape and
    place it against the VPU roofline (flop model in BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    from archnemesis_tpu.rt.scattering import (
        ScatterQuadrature, henyey_greenstein2, scloud11wave,
    )

    nc_nf, nwave, ng, nlay, nmu = 2, 256, 10, 39, 5
    rng = np.random.default_rng(1)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    mu, wt = np.polynomial.legendre.leggauss(2 * nmu)
    sel = mu > 0
    quad = ScatterQuadrature(mu=tuple(mu[sel]), wtmu=tuple(wt[sel]),
                             nf=nc_nf, nphi=100)
    f = f32(np.full((nwave, 1), 0.7))[:, :, None, None]
    g1 = f32(np.full((nwave, 1), 0.6))[:, :, None, None]
    g2 = f32(np.full((nwave, 1), -0.3))[:, :, None, None]
    pf = [lambda c: henyey_greenstein2(c[None], f[:, 0], g1[:, 0], g2[:, 0])]
    taus = f32(10.0 ** rng.uniform(-3, 1, (nwave, ng, nlay)))
    tauray = f32(10.0 ** rng.uniform(-4, -1, (nwave, nlay)))
    tausca = f32(10.0 ** rng.uniform(-3, 0, (nwave, nlay)))
    lfrac = f32(np.ones((nwave, 1, nlay)))
    fn = jax.jit(lambda t: scloud11wave(
        quad, pf, f32(np.zeros((nwave, nmu))),
        f32([45.0]), f32([30.0]), f32([60.0]),
        f32(np.full(nwave, 1e15)), f32(np.full((nwave, nlay), 1e-8)),
        t, tauray, tausca, lfrac, True, None,
    ))
    dt = timeit(fn, taus)
    nc = nc_nf + 1
    B = nc * nwave * ng * nlay
    F = nc * nwave * ng
    n_iter = 20  # typical max doubling count at these taus
    flop = B * n_iter * 1800 + F * nlay * 1800
    print(f"rows core f32 tile ({nwave} waves): {dt*1e3:.1f} ms  "
          f"{nwave/dt:.0f} gp/s  model {flop/1e9:.1f} Gflop -> "
          f"{flop/dt/1e12:.2f} Tflop/s = "
          f"{flop/dt/1.13e12*100:.0f}% of VPU peak", flush=True)


if __name__ == "__main__":
    import sys as _s
    if "--aos" in _s.argv:
        main()
    rows_core_profile()
