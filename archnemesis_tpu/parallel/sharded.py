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


def shard_lbl_blocks(ll, blocks, n_shards: int) -> ShardedLblData:
    """Host-side partitioner: contiguous block groups + halo'd line slices
    (lines referenced by each group's gathers), padded to uniform shapes."""
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
    return ShardedLblData(
        n_shards=n_shards, blocks_per_shard=bs, block_width=w,
        max_lines_per_block=m, n_wave=blocks.n_wave,
        line_idx=rel_idx, line_mask=rel_mask,
        wn=wn_row, wn_lo=wn_lo,
        # pad values keep the physics kernels finite: nu=1 (alpha_d > 0),
        # stim_ref=1; sw=0 and mask=0 already zero the contribution
        nu=nu_sl, nu_lo=nu_lo, sw=slice_pad(ll.sw, 0.0),
        elower=slice_pad(ll.elower, 0.0),
        stim_ref=slice_pad(ll.stim_ref, 1.0), broad=broad,
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
    )


def shard_runtime_lbl(rt, mesh: Mesh):
    """Partition a (windowed) RuntimeLBL's per-gas blocks over ``mesh``'s
    ``wave`` axis. The returned RuntimeLBL carries the placed shard data +
    mesh; forward.layer_optical_depths dispatches to the shard_map path."""
    n_shards = mesh.shape["wave"]
    shards = tuple(
        _place(shard_lbl_blocks(ll, blk, n_shards), mesh)
        for ll, blk in zip(rt.line_lists, rt.blocks)
    )
    return dataclasses.replace(rt, shard_data=shards, mesh=mesh)


def sharded_lbl_cross_section(
    ll, sh: ShardedLblData, mesh: Mesh, t_calc, p_calc, amb_frac,
    lineshape: str = "voigt", s_floor: float = 0.0,
    wn_calc_window: float = 25.0, wn_approx_window: float = 75.0,
    include_pressure_shift: bool = True, factor=None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """k(NWAVE, NLAY): the XLA panel kernel of ops.lbl run per wave shard
    under shard_map — each device sees only its own line slice and wave
    blocks (its halo), so no collective is needed.

    The Pallas kernel is not dispatched inside the shard body: its static
    line-column packing (ops/lbl_pallas._pad_line_columns) needs host
    arrays, but shard_map hands the body traced per-shard slices. A
    per-shard Pallas launch would take the host-side packing per shard at
    partition time — left for a real multi-chip deployment."""
    from jax import shard_map

    from archnemesis_tpu.ops.lbl import LblBlocks, lbl_cross_section

    if use_pallas is None:
        use_pallas = False

    t_calc = jnp.asarray(t_calc)
    p_calc = jnp.asarray(p_calc)
    amb_frac = jnp.asarray(amb_frac)

    def body(idx_s, mask_s, wn_s, wnlo_s, nu_s, nulo_s, sw_s, el_s, st_s,
             br_s, t, p, fr):
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
        k = lbl_cross_section(
            ll_s, blocks_s, t, p, fr, lineshape=lineshape, s_floor=s_floor,
            wn_calc_window=wn_calc_window,
            wn_approx_window=wn_approx_window,
            include_pressure_shift=include_pressure_shift, factor=factor,
            use_pallas=use_pallas, nu_lo=nulo_s[0], wn_lo=wnlo_s[0],
        )  # (Bs*W, NLAY)
        return k[None]

    w = P("wave")
    r = P()
    out = shard_map(
        body, mesh=mesh,
        in_specs=(w, w, w, w, w, w, w, w, w, w, r, r, r),
        out_specs=w,
        check_vma=False,
    )(sh.line_idx, sh.line_mask, sh.wn, sh.wn_lo, sh.nu, sh.nu_lo, sh.sw,
      sh.elower, sh.stim_ref, sh.broad, t_calc, p_calc, amb_frac)
    # (S, Bs*W, NLAY) -> (S*Bs*W, NLAY), trimmed to the true grid
    k = out.reshape(-1, out.shape[-1])
    return k[: sh.n_wave]
