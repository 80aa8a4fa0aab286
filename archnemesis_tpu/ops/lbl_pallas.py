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


def _pad_block_lines(ll, blocks: LblBlocks, factor: float, include_shift: bool):
    """Gather static line params into (NBLOCKS * M_pad, 1) column layouts.

    Padding lines are given nu far outside any window and zero strength.
    """
    m_pad = -(-blocks.max_lines_per_block // M_CHUNK) * M_CHUNK
    nb = blocks.n_blocks

    def gather(src, fill=0.0):
        out = np.full((nb, m_pad), fill, dtype=np.float64)
        src = np.asarray(src)
        valid = blocks.line_mask.astype(bool)
        out[:, : blocks.max_lines_per_block][valid] = src[
            blocks.line_idx[valid]
        ]
        return out.reshape(nb * m_pad, 1)

    cols = {
        "nu": gather(ll.nu, fill=-1.0e9),
        "sw": gather(np.asarray(ll.sw) * factor),
        "elower": gather(ll.elower),
        "stim_ref": gather(ll.stim_ref, fill=1.0),
        "g_self": gather(ll.broad[0]),
        "n_self": gather(ll.broad[1]),
        "g_amb": gather(ll.broad[3]),
        "n_amb": gather(ll.broad[4]),
        "d_amb": gather(ll.broad[5]) if include_shift else np.zeros((nb * m_pad, 1)),
    }
    return m_pad, cols


def _lbl_kernel(
    scal_ref,  # SMEM (1, 8): t, p, amb_frac, q_ratio
    wn_ref,  # (1, W) wave block
    nu_ref, sw_ref, el_ref, sr_ref, gs_ref, ns_ref, ga_ref, na_ref, da_ref,
    out_ref,  # (1, W)
    *,
    t_ref_const: float,
    p_ref_const: float,
    mass: float,
    s_floor: float,
    wn_calc: float,
    wn_approx: float,
    lineshape: str,
):
    m = pl.program_id(2)

    t = scal_ref[0, 0]
    p = scal_ref[0, 1]
    amb = scal_ref[0, 2]
    q_ratio = scal_ref[0, 3]

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
    ctr = nu + p_ratio * da_ref[:] * amb

    fn = voigt_mod.LINESHAPES[lineshape]

    delta = wn_ref[:] - ctr  # (1, W) - (M, 1) -> (M, W)
    in_win = (delta >= -wn_approx) & (delta < wn_approx)
    in_calc = (delta >= -wn_calc) & (delta < wn_calc)

    core = fn(delta, alpha_d, gamma_l)
    wing = fn(jnp.full_like(alpha_d, wn_calc), alpha_d, gamma_l) * (
        (wn_calc * wn_calc) / (delta * delta)
    )
    weight = jnp.where(s >= s_floor, s, 0.0)
    panel = jnp.where(in_calc, core, wing) * in_win.astype(core.dtype) * weight
    contrib = jnp.sum(panel, axis=0, keepdims=True)  # (1, W)

    @pl.when(m == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + contrib


def _lbl_pallas_impl(
    blocks: LblBlocks,
    m_pad: int,
    cols_stacked,  # (9, NBLOCKS*m_pad, 1)
    scal,  # (NLAY, 8)
    *,
    t_ref_const, p_ref_const, mass, s_floor, wn_calc, wn_approx, lineshape,
    dtype, interpret,
):
    nlay = scal.shape[0]
    nb = blocks.n_blocks
    w = blocks.block_width
    mc = m_pad // M_CHUNK

    wn2d = jnp.asarray(blocks.wn_pad, dtype).reshape(nb, w)
    line_spec = pl.BlockSpec(
        (M_CHUNK, 1), lambda l, b, m: (b * (m_pad // M_CHUNK) + m, 0),
        memory_space=pltpu.VMEM,
    )
    kwargs = dict(
        t_ref_const=t_ref_const, p_ref_const=p_ref_const, mass=mass,
        s_floor=s_floor, wn_calc=wn_calc, wn_approx=wn_approx,
        lineshape=lineshape,
    )
    out = pl.pallas_call(
        functools.partial(_lbl_kernel, **kwargs),
        grid=(nlay, nb, mc),
        in_specs=[
            pl.BlockSpec((1, 8), lambda l, b, m: (l, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w), lambda l, b, m: (b, 0),
                         memory_space=pltpu.VMEM),
        ] + [line_spec] * 9,
        out_specs=pl.BlockSpec((1, w), lambda l, b, m: (l, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nlay, nb * w), dtype),
        interpret=interpret,
    )(scal.astype(dtype), wn2d, *[c.astype(dtype) for c in cols_stacked])
    return out[:, : blocks.n_wave].T  # (NWAVE, NLAY)


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
    m_pad, cols = _pad_block_lines(ll, blocks, factor, include_pressure_shift)
    cols_tuple = tuple(
        jnp.asarray(cols[k])
        for k in ("nu", "sw", "elower", "stim_ref", "g_self", "n_self",
                  "g_amb", "n_amb", "d_amb")
    )

    t_calc = jnp.asarray(t_calc)
    dtype = jnp.result_type(t_calc.dtype, jnp.float32)

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
            blocks, m_pad, cols_tuple, scal,
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
