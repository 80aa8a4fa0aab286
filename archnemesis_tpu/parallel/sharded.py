"""Wave-axis sharding of the runtime line-by-line forward.

The runtime LBL engine already tiles the wavenumber grid into static blocks
whose line gathers include the 75 cm^-1 far-wing window plus pressure-shift
margin (ops/lbl.py build_blocks — the reference's per-line calc/approx
windows, LineData_0.py:241-275).  That halo makes wave sharding local: each
device owns a contiguous run of wave blocks plus exactly the (statically
known) slice of the sorted line list those blocks reference.  Lines near a
shard boundary are duplicated into both neighbours' slices — the "halo
exchange" of SURVEY §5 resolved at trace time instead of with runtime
ppermute, because line data is immutable for the whole run (the TPU-native
choice: static shapes, zero collectives in the hot loop).

``shard_runtime_lbl(rt, mesh)`` partitions every gas's blocks/lines over
``mesh``'s ``wave`` axis; the forward's runtime branch
(forward.layer_optical_depths) then computes each gas's cross-sections
under ``shard_map``, leaving the per-wave output sharded so every
downstream stage (CIA, RT integral) runs sharded by GSPMD propagation; the
only cross-shard communication in the whole forward is the final
convolution gather.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class ShardedLblData:
    """Per-gas static partition of (blocks, lines) over wave shards.

    Leading axis of every array is the shard index; arrays are device_put
    with that axis sharded over the mesh's ``wave`` axis.
    """

    n_shards: int
    blocks_per_shard: int
    block_width: int
    max_lines_per_block: int
    n_wave: int  # true (untrimmed) grid length

    # (S, Bs, M) block->line gathers, RELATIVE to the shard's line slice
    line_idx: Any
    line_mask: Any
    wn: Any  # (S, Bs * W) padded wave grid
    wn_lo: Any  # (S, Bs * W) f32 lo parts (two-float delta, ops/lbl.py)
    # (S, Lmax) halo'd line-parameter slices
    nu: Any
    nu_lo: Any  # (S, Lmax) f32 lo parts of the line centres
    sw: Any
    elower: Any
    stim_ref: Any
    broad: Any  # (S, 6, Lmax)

    # Pallas-kernel packing, hoisted to partition time so the kernel can
    # launch inside the shard_map body (the packing is static per shard):
    # (S, 10, Npad) line columns in ops/lbl_pallas._pad_line_columns order,
    # per-shard chunk ranges, and the static pad/chunk extents.
    p_cols: Any = None  # (S, 10, Npad) float64
    p_chunk0: Any = None  # (S, Bs) int32
    p_nch: Any = None  # (S, Bs) int32
    p_n_pad: int = 0
    p_mc: int = 0


def shard_lbl_blocks(ll, blocks, n_shards: int,
                     include_pressure_shift: bool = True) -> ShardedLblData:
    """Host-side partitioner: contiguous block groups + halo'd line slices
    (lines referenced by each group's gathers), padded to uniform shapes.

    Also performs the Pallas kernel's line-column packing per shard
    (ops/lbl_pallas._pad_line_columns + _block_chunk_ranges) — static per
    shard, so hoisting it here lets the kernel launch inside shard_map."""
    b, w, m = blocks.n_blocks, blocks.block_width, blocks.max_lines_per_block
    bs = -(-b // n_shards)
    bp = bs * n_shards

    idx = np.zeros((bp, m), dtype=np.int64)
    idx[:b] = blocks.line_idx
    mask = np.zeros((bp, m))
    mask[:b] = blocks.line_mask
    wn = np.full(bp * w, blocks.wn_pad[-1], dtype=np.asarray(blocks.wn_pad).dtype)
    wn[: b * w] = blocks.wn_pad

    lo = np.zeros(n_shards, dtype=np.int64)
    hi = np.zeros(n_shards, dtype=np.int64)
    for s in range(n_shards):
        rows_i = idx[s * bs : (s + 1) * bs]
        rows_m = mask[s * bs : (s + 1) * bs] > 0
        if rows_m.any():
            lo[s] = rows_i[rows_m].min()
            hi[s] = rows_i[rows_m].max() + 1
    lmax = max(int((hi - lo).max()), 1)

    nlines = ll.nu.shape[0]

    def slice_pad(arr, fill):
        out = np.full((n_shards, lmax), fill, dtype=np.asarray(arr).dtype)
        for s in range(n_shards):
            n = int(hi[s] - lo[s])
            out[s, :n] = np.asarray(arr)[lo[s] : hi[s]]
        return out

    broad = np.zeros((n_shards, 6, lmax), dtype=np.asarray(ll.broad).dtype)
    for s in range(n_shards):
        n = int(hi[s] - lo[s])
        broad[s, :, :n] = np.asarray(ll.broad)[:, lo[s] : hi[s]]

    rel_idx = np.zeros((n_shards, bs, m), dtype=np.int32)
    rel_mask = np.zeros((n_shards, bs, m))
    for s in range(n_shards):
        rows_i = idx[s * bs : (s + 1) * bs] - lo[s]
        rows_m = mask[s * bs : (s + 1) * bs]
        rel_idx[s] = np.where(rows_m > 0, rows_i, 0)
        rel_mask[s] = rows_m

    del nlines
    nu_sl = slice_pad(ll.nu, 1.0)
    # f32 lo parts for the two-float wavenumber delta (ops/lbl.py): the hi
    # parts are what device_put produces when the run is f32; in f64 runs
    # the los are simply unused
    nu_lo = (np.asarray(nu_sl, np.float64)
             - np.asarray(nu_sl, np.float64).astype(np.float32)
             ).astype(np.float32)
    wn_row = wn.reshape(n_shards, bs * w)
    wn_lo = (np.asarray(wn_row, np.float64)
             - np.asarray(wn_row, np.float64).astype(np.float32)
             ).astype(np.float32)

    # --- Pallas packing (per shard, static) ------------------------------
    from archnemesis_tpu.ops.lbl_pallas import M_CHUNK

    factor = 1.0 if ll.iso_id != 0 else float(ll.abundance)
    n_pad = max(-(-lmax // M_CHUNK) * M_CHUNK, M_CHUNK)
    max_chunk = n_pad // M_CHUNK - 1
    sw_sl = slice_pad(ll.sw, 0.0)
    el_sl = slice_pad(ll.elower, 0.0)
    st_sl = slice_pad(ll.stim_ref, 1.0)
    p_cols = np.zeros((n_shards, 10, n_pad), dtype=np.float64)
    p_cols[:, 0, :] = -1.0e9  # nu fill: far outside any window
    p_cols[:, 4, :] = 1.0  # stim_ref fill
    p_cols[:, 0, :lmax] = nu_sl
    p_cols[:, 1, :lmax] = nu_lo
    p_cols[:, 2, :lmax] = sw_sl * factor
    p_cols[:, 3, :lmax] = el_sl
    p_cols[:, 4, :lmax] = st_sl
    p_cols[:, 5, :lmax] = broad[:, 0]
    p_cols[:, 6, :lmax] = broad[:, 1]
    p_cols[:, 7, :lmax] = broad[:, 3]
    p_cols[:, 8, :lmax] = broad[:, 4]
    if include_pressure_shift:
        p_cols[:, 9, :lmax] = broad[:, 5]

    counts = (rel_mask > 0).sum(axis=2).astype(np.int64)  # (S, Bs)
    starts = np.where(counts > 0, rel_idx[:, :, 0], 0)
    ends = starts + counts
    p_chunk0 = np.minimum(starts // M_CHUNK, max_chunk).astype(np.int32)
    p_nch = np.where(
        counts > 0, -(-ends // M_CHUNK) - starts // M_CHUNK, 0
    ).astype(np.int32)
    p_mc = int(max(p_nch.max(), 1))

    return ShardedLblData(
        n_shards=n_shards, blocks_per_shard=bs, block_width=w,
        max_lines_per_block=m, n_wave=blocks.n_wave,
        line_idx=rel_idx, line_mask=rel_mask,
        wn=wn_row, wn_lo=wn_lo,
        # pad values keep the physics kernels finite: nu=1 (alpha_d > 0),
        # stim_ref=1; sw=0 and mask=0 already zero the contribution
        nu=nu_sl, nu_lo=nu_lo, sw=sw_sl,
        elower=el_sl,
        stim_ref=st_sl, broad=broad,
        p_cols=p_cols, p_chunk0=p_chunk0, p_nch=p_nch,
        p_n_pad=n_pad, p_mc=p_mc,
    )


def _place(sh: ShardedLblData, mesh: Mesh) -> ShardedLblData:
    spec = NamedSharding(mesh, P("wave"))
    put = lambda a: jax.device_put(jnp.asarray(a), spec)  # noqa: E731
    return dataclasses.replace(
        sh, line_idx=put(sh.line_idx), line_mask=put(sh.line_mask),
        wn=put(sh.wn), wn_lo=put(sh.wn_lo), nu=put(sh.nu),
        nu_lo=put(sh.nu_lo), sw=put(sh.sw),
        elower=put(sh.elower), stim_ref=put(sh.stim_ref),
        broad=put(sh.broad),
        p_cols=put(sh.p_cols), p_chunk0=put(sh.p_chunk0),
        p_nch=put(sh.p_nch),
    )


def shard_runtime_lbl(rt, mesh: Mesh):
    """Partition a (windowed) RuntimeLBL's per-gas blocks over ``mesh``'s
    ``wave`` axis. The returned RuntimeLBL carries the placed shard data +
    mesh; forward.layer_optical_depths dispatches to the shard_map path."""
    n_shards = mesh.shape["wave"]
    shards = tuple(
        _place(
            shard_lbl_blocks(
                ll, blk, n_shards,
                include_pressure_shift=rt.include_pressure_shift[i],
            ),
            mesh,
        )
        for i, (ll, blk) in enumerate(zip(rt.line_lists, rt.blocks))
    )
    return dataclasses.replace(rt, shard_data=shards, mesh=mesh)


def sharded_lbl_cross_section(
    ll, sh: ShardedLblData, mesh: Mesh, t_calc, p_calc, amb_frac,
    lineshape: str = "voigt", s_floor: float = 0.0,
    wn_calc_window: float = 25.0, wn_approx_window: float = 75.0,
    include_pressure_shift: bool = True, factor=None,
    use_pallas: bool | None = None,
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """k(NWAVE, NLAY): per-wave-shard LBL synthesis under shard_map — each
    device sees only its own line slice and wave blocks (its halo), so no
    collective is needed.

    ``use_pallas=None`` auto-selects: the Pallas VMEM kernel on a TPU
    backend (its per-shard line-column packing was hoisted to partition
    time, shard_lbl_blocks), the XLA panel kernel elsewhere.
    ``pallas_interpret=True`` forces the Pallas path in interpreter mode
    (CPU-mesh parity tests)."""
    from jax import shard_map

    from archnemesis_tpu.ops.lbl import LblBlocks, lbl_cross_section
    from archnemesis_tpu.ops.lbl_pallas import (
        lbl_cross_section_pallas_packed,
    )

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and sh.p_cols is not None
        )
    if pallas_interpret:
        use_pallas = True

    if factor is None:
        factor = 1.0 if ll.iso_id != 0 else float(ll.abundance)

    t_calc = jnp.asarray(t_calc)
    p_calc = jnp.asarray(p_calc)
    amb_frac = jnp.asarray(amb_frac)

    def body(idx_s, mask_s, wn_s, wnlo_s, nu_s, nulo_s, sw_s, el_s, st_s,
             br_s, pcols_s, pc0_s, pnch_s, t, p, fr):
        ll_s = dataclasses.replace(
            ll, nu=nu_s[0], sw=sw_s[0], elower=el_s[0],
            stim_ref=st_s[0], broad=br_s[0],
        )
        blocks_s = LblBlocks(
            block_width=sh.block_width, n_blocks=sh.blocks_per_shard,
            max_lines_per_block=sh.max_lines_per_block,
            line_idx=idx_s[0], line_mask=mask_s[0], wn_pad=wn_s[0],
            n_wave=sh.blocks_per_shard * sh.block_width,
        )
        if use_pallas:
            k = lbl_cross_section_pallas_packed(
                ll_s, blocks_s, sh.p_n_pad, sh.p_mc,
                pc0_s[0], pnch_s[0],
                wn_s[0][None, :], wnlo_s[0][None, :],
                tuple(pcols_s[0, i][:, None] for i in range(10)),
                t, p, fr,
                lineshape=lineshape, s_floor=s_floor,
                wn_calc_window=wn_calc_window,
                wn_approx_window=wn_approx_window,
                include_pressure_shift=include_pressure_shift,
                factor=factor, interpret=pallas_interpret,
            )  # (Bs*W, NLAY)
        else:
            k = lbl_cross_section(
                ll_s, blocks_s, t, p, fr, lineshape=lineshape,
                s_floor=s_floor,
                wn_calc_window=wn_calc_window,
                wn_approx_window=wn_approx_window,
                include_pressure_shift=include_pressure_shift,
                factor=factor,
                use_pallas=False, nu_lo=nulo_s[0], wn_lo=wnlo_s[0],
            )  # (Bs*W, NLAY)
        return k[None]

    w = P("wave")
    r = P()
    out = shard_map(
        body, mesh=mesh,
        in_specs=(w, w, w, w, w, w, w, w, w, w, w, w, w, r, r, r),
        out_specs=w,
        check_vma=False,
    )(sh.line_idx, sh.line_mask, sh.wn, sh.wn_lo, sh.nu, sh.nu_lo, sh.sw,
      sh.elower, sh.stim_ref, sh.broad, sh.p_cols, sh.p_chunk0, sh.p_nch,
      t_calc, p_calc, amb_frac)
    # (S, Bs*W, NLAY) -> (S*Bs*W, NLAY), trimmed to the true grid
    k = out.reshape(-1, out.shape[-1])
    return k[: sh.n_wave]
