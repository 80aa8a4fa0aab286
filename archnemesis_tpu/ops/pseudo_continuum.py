"""Pseudo-continuum absorption from pre-binned weak lines (Irwin+19).

TPU-first rewrite of the reference kernels
``LineData_0.add_pseudo_continuum_monochromatic_absorption`` (:486) and
``add_pseudo_continuum_monochromatic_spectrum`` (:361): weak lines excluded
from the explicit LBL sum are pre-binned into (strength sum,
strength-weighted width/energy) coarse bins; at runtime each bin's strength
is re-scaled to the layer (T, P) like a single effective line, spread over
±K neighbouring bins with a normalised lineshape stencil, divided by the bin
width, and tent-interpolated onto the fine wave grid.

The reference's triple nested loops become: one batched line-physics block
over bins, a fixed-size (2K+1)-tap stencil as shifted adds, and a 3-candidate
gather for the grid interpolation — all pure jnp, vmapped over layers.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.constants import C2_CGS
from archnemesis_tpu.ops import voigt as voigt_mod
from archnemesis_tpu.ops.lbl import DOPPLER_CONST


@dataclass
class PseudoContinuum:
    """Pre-binned weak-line data for one isotopologue (reference
    PseudoContinuumData, database/datatypes/pseudo_continuum_data.py:9)."""

    t_ref: float  # tabulation temperature (K)
    p_ref: float  # tabulation pressure (atm)
    mass: float  # isotopic molar mass (g/mol)
    abundance: float  # isotopic abundance factor applied to the result

    wn_bin_center: np.ndarray  # (N,) cm-1, ascending
    wn_bin_width: np.ndarray  # (N,)
    strength_sum: np.ndarray  # (N,) sum of weak-line strengths at t_ref
    lsw_e_lower: np.ndarray  # (N,) strength-weighted lower-state energy
    lsw_gamma_self: np.ndarray  # (N,)
    lsw_n_self: np.ndarray  # (N,)
    lsw_gamma_amb: np.ndarray  # (N,)
    lsw_n_amb: np.ndarray  # (N,)

    pf_temp: np.ndarray
    pf_q: np.ndarray


def pseudo_continuum_k(
    pc: PseudoContinuum,
    wave,
    t_calc,
    p_calc,
    amb_frac,
    lineshape: str = "voigt",
    n_neighbour_bins: int = 3,
):
    """Pseudo-continuum cross-section k(NWAVE, NLAY) [cm^2 molecule^-1].

    t_calc/p_calc/amb_frac: (NLAY,) layer temperature [K], pressure [atm]
    and ambient-gas fraction. ``wave`` is the (static) calc grid in cm-1.
    """
    fn = voigt_mod.LINESHAPES[lineshape]
    wave = np.asarray(wave)
    ctr = jnp.asarray(pc.wn_bin_center)
    wid = jnp.asarray(pc.wn_bin_width)
    nb = pc.wn_bin_center.shape[0]
    kk = n_neighbour_bins

    # --- static stencil geometry: bin-to-bin deltas and validity masks
    idx = np.arange(nb)
    nbr = idx[:, None] + np.arange(-kk, kk + 1)[None, :]  # (N, 2K+1)
    valid = (nbr >= 0) & (nbr < nb)
    nbr_c = np.clip(nbr, 0, nb - 1)
    delta = pc.wn_bin_center[nbr_c] - pc.wn_bin_center[:, None]

    # source-bin range (reference :399-417): bins entirely above the grid
    # do not spread (first index whose upper edge exceeds the grid end)
    bin_max = pc.wn_bin_center + pc.wn_bin_width / 2.0
    above = np.nonzero(bin_max > wave[-1])[0]
    last_idx = int(above[0]) if above.size else nb
    # the reference's first-index scan (:399-417) only ever matches bin 0
    # (ascending bin mins), so a bin set starting above the grid start
    # spreads nothing at all — replicated
    first_idx = 0 if (pc.wn_bin_center[0] - pc.wn_bin_width[0] / 2.0
                      <= wave[0]) else nb
    src_ok = (idx >= first_idx) & (idx < last_idx)

    # --- static grid interpolation stencil: 3 candidate bins per grid point
    pos = np.searchsorted(pc.wn_bin_center, wave)
    cand = np.clip(pos[:, None] + np.array([-1, 0, 1])[None, :], 0, nb - 1)
    d_cand = (wave[:, None] - pc.wn_bin_center[cand]) / pc.wn_bin_width[cand]
    inside = (d_cand >= -0.5) & (d_cand < 0.5)
    # drop duplicate candidate indices (edge clipping)
    dup = np.zeros_like(inside)
    dup[:, 1] = cand[:, 1] == cand[:, 0]
    dup[:, 2] = (cand[:, 2] == cand[:, 1]) | (cand[:, 2] == cand[:, 0])
    inside &= ~dup
    counts = inside.sum(axis=1)
    covered = counts > 0
    if covered.any():
        j_max_covered = int(np.nonzero(covered)[0][-1])
    else:
        j_max_covered = -1
    # the reference's final division loop runs j in [j_min, j_max)
    # EXCLUSIVE of j_max (LineData_0.py:478), so the last covered grid
    # point is dropped — replicated for bit-parity
    out_mask = covered.copy()
    if j_max_covered >= 0:
        out_mask[j_max_covered] = False
    tent = 1.0 - np.abs(d_cand)
    side = np.sign(d_cand)  # -1: take i-1 as secondary, +1: take i+1
    sec = np.clip(cand + side.astype(int), 0, nb - 1)
    # secondary contribution only when the neighbour exists (reference
    # :454-457: i>0 / i<N-1 guards)
    sec_ok = inside & (
        ((side < 0) & (cand > 0)) | ((side > 0) & (cand < nb - 1))
    )

    q_t_ref = np.interp(pc.t_ref, pc.pf_temp, pc.pf_q)
    stim_ref = 1.0 - np.exp(-C2_CGS * pc.wn_bin_center / pc.t_ref)

    def per_layer(t, p, amb):
        q_t = jnp.interp(t, jnp.asarray(pc.pf_temp), jnp.asarray(pc.pf_q))
        q_ratio = q_t_ref / q_t
        boltz = jnp.exp(
            C2_CGS * (t - pc.t_ref) / (t * pc.t_ref) * jnp.asarray(pc.lsw_e_lower)
        )
        stim = 1.0 - jnp.exp(-C2_CGS * ctr / t)
        s = (
            jnp.asarray(pc.strength_sum)
            * (stim / jnp.asarray(stim_ref))
            * boltz
            * q_ratio
        )  # (N,)

        alpha_d = DOPPLER_CONST * ctr * jnp.sqrt(t / pc.mass)
        t_ratio = pc.t_ref / t
        p_ratio = p / pc.p_ref
        gamma_l = (
            t_ratio ** jnp.asarray(pc.lsw_n_self)
            * jnp.asarray(pc.lsw_gamma_self) * (1.0 - amb)
            + t_ratio ** jnp.asarray(pc.lsw_n_amb)
            * jnp.asarray(pc.lsw_gamma_amb) * amb
        ) * p_ratio

        # neighbour-spread stencil (reference :421-432): per-bin lineshape
        # over the (2K+1) neighbour deltas, normalised per SOURCE bin
        y = fn(jnp.asarray(delta), alpha_d[:, None], gamma_l[:, None])
        y = y * jnp.asarray(valid)
        ysum = jnp.sum(y, axis=1)
        w = jnp.where(ysum[:, None] > 0, y / ysum[:, None], 0.0)
        contrib = s[:, None] * w * jnp.asarray(src_ok)[:, None]  # (N, 2K+1)
        # scatter-add to neighbour positions: x[i+dk] += contrib[i, k]
        x = jnp.zeros(nb)
        x = x.at[jnp.asarray(nbr_c)].add(
            contrib * jnp.asarray(valid)
        )
        x = x / wid  # per-bin continuum density (:434-435)

        # tent interpolation onto the grid with count normalisation
        prim = jnp.asarray(tent) * x[jnp.asarray(cand)]
        secd = (1.0 - jnp.asarray(tent)) * x[jnp.asarray(sec)]
        z0 = jnp.sum(
            (prim * jnp.asarray(inside) + secd * jnp.asarray(sec_ok))
            * pc.abundance,
            axis=1,
        )
        z1 = jnp.asarray(counts, dtype=z0.dtype)
        return jnp.where(
            jnp.asarray(out_mask), z0 / jnp.maximum(z1, 1.0), 0.0
        )

    k = jax.vmap(per_layer)(
        jnp.asarray(t_calc), jnp.asarray(p_calc), jnp.asarray(amb_frac)
    )  # (NLAY, NWAVE)
    return k.T
