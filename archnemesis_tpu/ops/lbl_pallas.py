"""Pallas TPU kernel for line-by-line Voigt opacity synthesis.

This is the hand-written fast path behind :func:`archnemesis_tpu.ops.lbl.
lbl_cross_section` (the TPU re-design of the reference's LBL hot loop,
``LineData_0.py:229`` add_line_set_monochromatic_spectrum). The XLA path
gathers per-(layer, block, line) strength/width panels to HBM before the
reduction; this kernel instead keeps only the *static* per-line parameters
(nu, S_ref, E", broadening coefficients) resident per wave-block and computes
the layer physics (Boltzmann/stimulated-emission strength scaling, Doppler &
Lorentz HWHM, pressure shift) on the VPU inside VMEM, so HBM traffic is
O(blocks * lines) once instead of O(layers * blocks * lines) and the
(lines x wave) Voigt panel never leaves the chip.

Grid: (NLAY, NBLOCKS, M_CHUNKS) — the line axis is innermost so each output
(layer, wave-block) tile is revisited and accumulated in place.

Gradients: the kernel carries a custom JVP that delegates the tangent
computation to the XLA implementation (same numerics), so `jax.jacfwd`
through a runtime-LBL forward model works with the fast primal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from archnemesis_tpu.constants import C2_CGS
from archnemesis_tpu.ops import voigt as voigt_mod
from archnemesis_tpu.ops.lbl import DOPPLER_CONST, LblBlocks

M_CHUNK = 512  # lines per inner grid step (panel = M_CHUNK x W floats)


def _pad_line_columns(ll, factor: float, include_shift: bool):
    """Pad the SORTED line-parameter arrays once to an M_CHUNK multiple —
    (N_pad, 1) column layouts stored a single time in HBM.

    Per-block access happens through scalar-prefetched chunk offsets (the
    blocks' line ranges are contiguous in the sorted list), so memory is
    O(N) instead of the O(NBLOCKS * M) a per-block gather would cost —
    with a dense line list every block references nearly the whole list
    and the gather explodes.  Padding lines get nu far outside any window
    and zero strength.
    """
    n = np.asarray(ll.nu).shape[0]
    n_pad = max(-(-n // M_CHUNK) * M_CHUNK, M_CHUNK)

    def pad(src, fill=0.0):
        out = np.full((n_pad, 1), fill, dtype=np.float64)
        out[:n, 0] = np.asarray(src)
        return out

    nu64 = np.asarray(ll.nu, dtype=np.float64)
    nu_hi32 = nu64.astype(np.float32)
    cols = {
        "nu": pad(ll.nu, fill=-1.0e9),
        # f32 lo part of nu (two-float delta, see ops/lbl.py): restores the
        # f64 ulps the f32 hi part loses; zero when computing in f64
        "nu_lo": pad(nu64 - nu_hi32),
        "sw": pad(np.asarray(ll.sw) * factor),
        "elower": pad(ll.elower),
        "stim_ref": pad(ll.stim_ref, fill=1.0),
        "g_self": pad(ll.broad[0]),
        "n_self": pad(ll.broad[1]),
        "g_amb": pad(ll.broad[3]),
        "n_amb": pad(ll.broad[4]),
        "d_amb": pad(ll.broad[5]) if include_shift else np.zeros((n_pad, 1)),
    }
    return n_pad, cols


def _block_chunk_ranges(blocks: LblBlocks, n_pad: int):
    """Per wave-block [first_chunk, n_chunks) line-chunk ranges (int32).

    The block's line range is contiguous in the sorted list (build_blocks
    uses searchsorted), so chunk granularity only adds lines just outside
    the range — they fall outside the block's 75 cm^-1 window and
    contribute exactly zero through the in_win mask.
    """
    counts = blocks.line_mask.sum(axis=1).astype(np.int64)
    starts = np.where(counts > 0, blocks.line_idx[:, 0], 0)
    ends = starts + counts
    chunk0 = starts // M_CHUNK
    nch = np.where(counts > 0, -(-ends // M_CHUNK) - chunk0, 0)
    max_chunk = n_pad // M_CHUNK - 1
    chunk0 = np.minimum(chunk0, max_chunk)
    return (chunk0.astype(np.int32), nch.astype(np.int32),
            int(max(nch.max(), 1)))


def _lbl_kernel(
    chunk0_ref,  # scalar-prefetch (NB,): first line chunk of each block
    nch_ref,  # scalar-prefetch (NB,): number of line chunks of each block
    scal_ref,  # scalar-prefetch (NLAY, 8): t, p, amb_frac, q_ratio
    wn_ref,  # (1, W) wave block (hi part)
    wn_lo_ref,  # (1, W) f32 lo part of the wave grid (zero in f64)
    nu_ref, nu_lo_ref, sw_ref, el_ref, sr_ref, gs_ref, ns_ref, ga_ref,
    na_ref, da_ref,
    out_ref,  # (1, W)
    *,
    t_ref_const: float,
    p_ref_const: float,
    mass: float,
    s_floor: float,
    wn_calc: float,
    wn_approx: float,
    lineshape: str,
    twofloat: bool,
):
    m = pl.program_id(2)
    lay = pl.program_id(0)

    t = scal_ref[lay, 0]
    p = scal_ref[lay, 1]
    amb = scal_ref[lay, 2]
    q_ratio = scal_ref[lay, 3]

    nu = nu_ref[:]  # (M_CHUNK, 1)
    boltz = jnp.exp(C2_CGS * (t - t_ref_const) / (t * t_ref_const) * el_ref[:])
    stim = 1.0 - jnp.exp(-C2_CGS * nu / t)
    s = sw_ref[:] * (stim / sr_ref[:]) * boltz * q_ratio

    alpha_d = DOPPLER_CONST * nu * jnp.sqrt(t / mass)
    t_ratio = t_ref_const / t
    p_ratio = p / p_ref_const
    gamma_l = (
        t_ratio ** ns_ref[:] * gs_ref[:] * (1.0 - amb)
        + t_ratio ** na_ref[:] * ga_ref[:] * amb
    ) * p_ratio
    shift = p_ratio * da_ref[:] * amb

    fn = voigt_mod.LINESHAPES[lineshape]

    if twofloat:
        # two-float delta (see ops/lbl.py): hi parts subtract exactly where
        # it matters, lo parts restore the f64 ulps
        delta = (
            (wn_ref[:] - nu) + (wn_lo_ref[:] - nu_lo_ref[:]) - shift
        )  # (1, W) - (M, 1) -> (M, W)
    else:
        # f64: the reference's association wn - (nu + shift)
        delta = wn_ref[:] - (nu + shift)
    in_win = (delta >= -wn_approx) & (delta < wn_approx)
    in_calc = (delta >= -wn_calc) & (delta < wn_calc)

    core = fn(delta, alpha_d, gamma_l)
    wing = fn(jnp.full_like(alpha_d, wn_calc), alpha_d, gamma_l) * (
        (wn_calc * wn_calc) / (delta * delta)
    )
    weight = jnp.where(s >= s_floor, s, 0.0)
    panel = jnp.where(in_calc, core, wing) * in_win.astype(core.dtype) * weight
    contrib = jnp.sum(panel, axis=0, keepdims=True)  # (1, W)

    b = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # chunks beyond this block's line range are clamped re-reads of the
    # last chunk; their lines sit outside the 75 cm^-1 window and in_win
    # already zeroes them, but skip the accumulate to save VPU work
    @pl.when(m < nch_ref[b])
    def _():
        out_ref[:] = out_ref[:] + contrib


def _lbl_pallas_impl(
    nb: int,  # number of wave blocks
    w: int,  # block width
    n_wave: int,  # true grid length (<= nb*w)
    n_pad: int,
    chunk0,  # (NB,) int32 scalar-prefetch
    nch,  # (NB,) int32 scalar-prefetch
    mc,  # grid extent of the line-chunk axis
    wn1r,  # (1, NB*W) wave row, hi part
    wn1r_lo,  # (1, NB*W) f32 lo part (zeros in f64)
    cols_stacked,  # 10 x (N_pad, 1) line-parameter columns (stored once)
    scal,  # (NLAY, 8)
    *,
    t_ref_const, p_ref_const, mass, s_floor, wn_calc, wn_approx, lineshape,
    dtype, interpret,
):
    # TPU lowering requires the last-two block dims be (divisible by 8,
    # divisible by 128) or equal to the array dims — single-row layouts
    # (1, NB*W) with (1, W) blocks satisfy the "equal" clause on the
    # sublane axis while keeping 128-lane alignment on the wave axis.
    nlay = scal.shape[0]
    max_chunk = n_pad // M_CHUNK - 1

    def line_index(l, b, m, chunk0_ref, nch_ref, scal_ref):
        return (jnp.minimum(chunk0_ref[b] + m, max_chunk), 0)

    line_spec = pl.BlockSpec((M_CHUNK, 1), line_index)
    kwargs = dict(
        t_ref_const=t_ref_const, p_ref_const=p_ref_const, mass=mass,
        s_floor=s_floor, wn_calc=wn_calc, wn_approx=wn_approx,
        lineshape=lineshape, twofloat=dtype == jnp.float32,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nlay, nb, mc),
        in_specs=[
            pl.BlockSpec((1, w), lambda l, b, m, *_: (0, b)),
            pl.BlockSpec((1, w), lambda l, b, m, *_: (0, b)),
        ] + [line_spec] * 10,
        out_specs=pl.BlockSpec((1, w), lambda l, b, m, *_: (0, l * nb + b)),
    )
    line_cols = [c.astype(dtype) for c in cols_stacked]
    if dtype != jnp.float32:
        line_cols[1] = jnp.zeros_like(line_cols[1])  # nu_lo only in f32
    out = pl.pallas_call(
        functools.partial(_lbl_kernel, **kwargs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, nlay * nb * w), dtype),
        interpret=interpret,
    )(jnp.asarray(chunk0), jnp.asarray(nch), scal.astype(dtype),
      wn1r.astype(dtype), wn1r_lo.astype(dtype), *line_cols)
    out = out.reshape(nlay, nb * w)
    return out[:, :n_wave].T  # (NWAVE, NLAY)


def lbl_cross_section_pallas(
    ll,
    blocks: LblBlocks,
    t_calc,
    p_calc,
    amb_frac,
    lineshape: str = "voigt",
    s_floor: float = 0.0,
    wn_calc_window: float = 25.0,
    wn_approx_window: float = 75.0,
    include_pressure_shift: bool = True,
    factor: float | None = None,
    interpret: bool = False,
):
    """Pallas fast path for :func:`archnemesis_tpu.ops.lbl.lbl_cross_section`.

    Same contract: k(NWAVE, NLAY) [cm^2 molecule^-1]. `interpret=True` runs
    the kernel in the Pallas interpreter (for CPU tests).

    Differentiable w.r.t. (t_calc, p_calc, amb_frac) through a custom JVP
    that evaluates the tangent with the XLA implementation.
    """
    if factor is None:
        factor = 1.0 if ll.iso_id != 0 else ll.abundance
    n_pad, cols = _pad_line_columns(ll, factor, include_pressure_shift)
    chunk0, nch, mc = _block_chunk_ranges(blocks, n_pad)
    cols_tuple = tuple(
        jnp.asarray(cols[k])
        for k in ("nu", "nu_lo", "sw", "elower", "stim_ref", "g_self",
                  "n_self", "g_amb", "n_amb", "d_amb")
    )

    t_calc = jnp.asarray(t_calc)
    dtype = jnp.result_type(t_calc.dtype, jnp.float32)

    nb, w = blocks.n_blocks, blocks.block_width
    wn64 = np.asarray(blocks.wn_pad, dtype=np.float64)
    wn1r = jnp.asarray(wn64, dtype).reshape(1, nb * w)
    if dtype == jnp.float32:
        wn1r_lo = jnp.asarray(
            (wn64 - wn64.astype(np.float32)).astype(np.float32)
        ).reshape(1, nb * w)
    else:
        wn1r_lo = jnp.zeros((1, nb * w), dtype)

    @jax.custom_jvp
    def run(t, p, amb):
        q_t = jnp.interp(t, jnp.asarray(ll.pf_temp), jnp.asarray(ll.pf_q))
        q_ratio = jnp.interp(
            jnp.asarray(ll.t_ref), jnp.asarray(ll.pf_temp),
            jnp.asarray(ll.pf_q),
        ) / q_t
        scal = jnp.stack(
            [t, p, amb, q_ratio] + [jnp.zeros_like(t)] * 4, axis=1
        )
        return _lbl_pallas_impl(
            nb, w, blocks.n_wave, n_pad, chunk0, nch, mc, wn1r, wn1r_lo,
            cols_tuple, scal,
            t_ref_const=float(ll.t_ref), p_ref_const=float(ll.p_ref),
            mass=float(ll.mass), s_floor=s_floor, wn_calc=wn_calc_window,
            wn_approx=wn_approx_window, lineshape=lineshape,
            dtype=dtype, interpret=interpret,
        )

    @run.defjvp
    def run_jvp(primals, tangents):
        from archnemesis_tpu.ops.lbl import lbl_cross_section

        def xla(t, p, amb):
            return lbl_cross_section(
                ll, blocks, t, p, amb, lineshape=lineshape, s_floor=s_floor,
                wn_calc_window=wn_calc_window,
                wn_approx_window=wn_approx_window,
                include_pressure_shift=include_pressure_shift, factor=factor,
                use_pallas=False,
            )

        primal_out = run(*primals)
        _, tangent_out = jax.jvp(xla, primals, tangents)
        return primal_out, tangent_out

    return run(t_calc, jnp.asarray(p_calc), jnp.asarray(amb_frac))


def lbl_cross_section_pallas_packed(
    ll_shard,
    blocks_shard: LblBlocks,
    n_pad: int,
    mc: int,
    chunk0,  # (NB,) int32 — may be traced (per-shard slice)
    nch,  # (NB,) int32
    wn1r,  # (1, NB*W) hi part
    wn1r_lo,  # (1, NB*W) f32 lo part
    cols_tuple,  # 10 traced (N_pad, 1) columns, f64 host-packed per shard
    t_calc, p_calc, amb_frac,
    *,
    lineshape: str = "voigt",
    s_floor: float = 0.0,
    wn_calc_window: float = 25.0,
    wn_approx_window: float = 75.0,
    include_pressure_shift: bool = True,
    factor: float = 1.0,
    interpret: bool = False,
):
    """Pallas LBL synthesis from PRE-PACKED per-shard line columns.

    This is the shard_map-compatible twin of
    :func:`lbl_cross_section_pallas`: the host-side packing
    (`_pad_line_columns` / `_block_chunk_ranges`) is hoisted to partition
    time (parallel/sharded.shard_lbl_blocks), so every argument here may
    be a traced per-shard slice.  ``ll_shard``/``blocks_shard`` are the
    shard-local LineList/LblBlocks used ONLY by the XLA tangent fallback
    of the custom JVP (their array fields may be traced).

    The iso-abundance ``factor`` must already be folded into the packed
    sw column AND passed here for the tangent path.
    """
    t_calc = jnp.asarray(t_calc)
    dtype = jnp.result_type(t_calc.dtype, jnp.float32)
    nb, w = blocks_shard.n_blocks, blocks_shard.block_width

    @jax.custom_jvp
    def run(t, p, amb):
        q_t = jnp.interp(
            t, jnp.asarray(ll_shard.pf_temp), jnp.asarray(ll_shard.pf_q)
        )
        q_ratio = jnp.interp(
            jnp.asarray(ll_shard.t_ref), jnp.asarray(ll_shard.pf_temp),
            jnp.asarray(ll_shard.pf_q),
        ) / q_t
        scal = jnp.stack(
            [t, p, amb, q_ratio] + [jnp.zeros_like(t)] * 4, axis=1
        )
        lo = wn1r_lo if dtype == jnp.float32 else jnp.zeros_like(wn1r)
        return _lbl_pallas_impl(
            nb, w, blocks_shard.n_wave, n_pad, chunk0, nch, mc,
            wn1r, lo, cols_tuple, scal,
            t_ref_const=float(ll_shard.t_ref),
            p_ref_const=float(ll_shard.p_ref),
            mass=float(ll_shard.mass), s_floor=s_floor,
            wn_calc=wn_calc_window, wn_approx=wn_approx_window,
            lineshape=lineshape, dtype=dtype, interpret=interpret,
        )

    @run.defjvp
    def run_jvp(primals, tangents):
        from archnemesis_tpu.ops.lbl import lbl_cross_section

        def xla(t, p, amb):
            return lbl_cross_section(
                ll_shard, blocks_shard, t, p, amb, lineshape=lineshape,
                s_floor=s_floor, wn_calc_window=wn_calc_window,
                wn_approx_window=wn_approx_window,
                include_pressure_shift=include_pressure_shift,
                factor=factor, use_pallas=False,
            )

        primal_out = run(*primals)
        _, tangent_out = jax.jvp(xla, primals, tangents)
        return primal_out, tangent_out

    return run(t_calc, jnp.asarray(p_calc), jnp.asarray(amb_frac))
