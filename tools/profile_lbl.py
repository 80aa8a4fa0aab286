"""Roofline profiling of the Pallas runtime-LBL kernel (real TPU).

Times `lbl_cross_section_pallas` at controlled (layers, blocks, chunks)
shapes, reports the implied VPU flop rate against the measured VPU peak
(tools/bench_vpu_peak.py: 1.13 Tflop/s f32 on this v5e), and prints the
grid statistics of the bench shape so the op-count model in BASELINE.md
is grounded in what the kernel actually executes.

Cost model per grid step (one (M_CHUNK x W) panel):
- per line (M x 1): strength scaling (exp x2, mul ~10), widths (pow x2,
  ~15), wing Voigt eval (~220 flop, hoisted: its args are (M,1))
  -> ~470 flop/line
- per (line, wave) element: two-float delta (4), window masks (4),
  Weideman-24 cpf via complex Horner (~170) + far-wing branch select +
  wing scaling (~10), weight multiply-accumulate (3) -> ~200 flop/elem
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FLOP_PER_ELEM = 200.0
FLOP_PER_LINE = 470.0
VPU_PEAK = 1.13e12  # measured, tools/bench_vpu_peak.py


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from archnemesis_tpu.io.linedata import read_lls_runtime
    from archnemesis_tpu.ops.lbl import build_blocks
    from archnemesis_tpu.ops.lbl_pallas import (
        M_CHUNK,
        _block_chunk_ranges,
        _pad_line_columns,
        lbl_cross_section_pallas,
    )

    rt = read_lls_runtime("tests/fixtures/co_runtime/cirstest.lls")
    ll0 = rt.line_lists[0]
    rng = np.random.default_rng(1)

    def tiled_list(reps):
        nu = np.concatenate(
            [ll0.nu + rng.uniform(-20.0, 20.0) for _ in range(reps)]
        )
        order = np.argsort(nu)
        tile = lambda a: np.concatenate([a] * reps)[order]  # noqa: E731
        return dataclasses.replace(
            ll0, nu=nu[order], sw=tile(ll0.sw) / reps,
            elower=tile(ll0.elower), stim_ref=tile(ll0.stim_ref),
            broad=np.stack([tile(ll0.broad[i]) for i in range(6)]),
        )

    print(f"backend={jax.default_backend()} M_CHUNK={M_CHUNK}", flush=True)

    for reps, nwave, nlay in [(10, 20_000, 8), (60, 80_000, 40)]:
        ll = tiled_list(reps)
        wave = np.arange(2110.0, 2190.0, 80.0 / nwave)[:nwave]
        blocks = build_blocks(wave, ll.nu)
        n_pad, _ = _pad_line_columns(ll, 1.0, True)
        chunk0, nch, mc = _block_chunk_ranges(blocks, n_pad)
        panels = int(nlay * np.minimum(nch, mc).sum())
        elems = panels * M_CHUNK * blocks.block_width
        lines_work = panels * M_CHUNK
        flop = elems * FLOP_PER_ELEM + lines_work * FLOP_PER_LINE
        t = np.linspace(150.0, 280.0, nlay)
        p = np.logspace(-3, 0, nlay)
        amb = np.full(nlay, 0.9)

        fn = jax.jit(lambda tt, pp, aa: lbl_cross_section_pallas(
            ll, blocks, tt, pp, aa, s_floor=0.0))
        tt = jnp.asarray(t, jnp.float32)
        pp = jnp.asarray(p, jnp.float32)
        aa = jnp.asarray(amb, jnp.float32)
        out = fn(tt, pp, aa)
        _ = float(np.asarray(out).sum())
        t0 = time.perf_counter()
        nrep = 3
        for _ in range(nrep):
            out = fn(tt, pp, aa)
        s = float(np.asarray(out).sum())
        dt = (time.perf_counter() - t0) / nrep
        assert np.isfinite(s)
        print(
            f"nlines={ll.nu.size} nwave={nwave} nlay={nlay}: "
            f"blocks={blocks.n_blocks} mc={mc} panels/layer={panels//nlay} "
            f"mean nch={nch.mean():.1f}", flush=True,
        )
        print(
            f"  time={dt*1e3:.1f} ms  model flop={flop:.3e}  "
            f"implied={flop/dt/1e12:.2f} Tflop/s  "
            f"vs VPU peak {VPU_PEAK/1e12:.2f} -> "
            f"{flop/dt/VPU_PEAK*100.0:.0f}% of peak  "
            f"gp/s={nwave/dt:.0f}", flush=True,
        )


if __name__ == "__main__":
    main()
