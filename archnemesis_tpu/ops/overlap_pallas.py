"""Pallas TPU kernel for random-overlap k-distribution mixing.

The XLA path (ops/overlap.py) pays an HBM-resident 400-wide sort per gas
pair (~250 ms/pair at production shapes). Here the whole combine — pair
sums, bitonic co-sort of (tau, weight[, tangent]), prefix-sum of weights,
and the interval-overlap rebin — runs on (row-tile, 512) blocks in VMEM,
so HBM traffic collapses to streaming the (R, NG) inputs/outputs once.

The bitonic network uses lane rotations for the i^stride partner exchange
(two ``pltpu.roll`` + select per stage; no gathers), and the g-bin edges /
pair weights are compile-time constants derived from the static del_g.

A custom JVP co-sorts the tangent of tau through the same network (the
permutation and bin intervals depend only on the primal), which is what
``jax.jacfwd`` needs for analytic Jacobians through the correlated-k path.

Reference numerics being reproduced: resort-rebin ``rankg``
(ForwardModel_0.py:5960) / ``k_overlapg`` (:5843).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from archnemesis_tpu.ops.overlap import g_bin_edges

ROW_TILE = 256


def _bitonic_stages(n: int, start_size: int = 2):
    """(size, stride) pairs of the bitonic sorting network for n=2^k,
    starting at merge level ``start_size`` (the input must then satisfy the
    post-level-(start_size/2) invariant: every aligned start_size/2 block
    sorted, ascending in even blocks, descending in odd ones)."""
    stages = []
    size = start_size
    while size <= n:
        stride = size // 2
        while stride >= 1:
            stages.append((size, stride))
            stride //= 2
        size *= 2
    return stages


def _run_layout(ng: int):
    """Presorted-runs layout for the ng^2 pair sums a_i + b_j.

    Both inputs are k-distributions, ascending along g by construction
    (table g-axes are sorted; the P-T interpolation is a clamped convex
    blend in log space; rebin outputs are means over increasing value
    intervals) — so the pair-sum matrix has sorted rows and columns. Laying
    it out as aligned runs of r = 2^floor(log2 ng), alternating
    ascending/descending, satisfies the bitonic invariant after level r and
    lets the network skip every level of size <= r (10 of 45 stages at
    NG=20).

    Coverage (disjoint): region A = all i x j<r as ng row-runs of r;
    region B = j>=r x i<r as d column-runs of r; region C = the d x d
    corner as d column-runs of d padded to r (d = ng - r < r).

    Returns (blocks, atom_idx (e_pad,), start_size) or None when the
    ng + 2d runs of r don't fit in e_pad lanes (then the plain
    construction + full network is used).
    """
    r = 1 << (ng.bit_length() - 1)
    d = ng - r
    e_pad = 1 << (ng * ng - 1).bit_length()
    if (ng + 2 * d) * r > e_pad:
        return None
    blocks = [("A", i) for i in range(ng)]
    blocks += [("B", j) for j in range(r, ng)]
    blocks += [("C", j) for j in range(r, ng)]
    blocks += [("P", 0)] * (e_pad // r - len(blocks))
    atom = np.full(e_pad, -1, dtype=np.int64)
    for m, (kind, q) in enumerate(blocks):
        rev = bool(m & 1)
        base = m * r
        if kind == "A":
            js = range(r - 1, -1, -1) if rev else range(r)
            for t, j in enumerate(js):
                atom[base + t] = q * ng + j
        elif kind == "B":
            iis = range(r - 1, -1, -1) if rev else range(r)
            for t, i in enumerate(iis):
                atom[base + t] = i * ng + q
        elif kind == "C":
            iis = range(ng - 1, r - 1, -1) if rev else range(r, ng)
            off = r - d if rev else 0
            for t, i in enumerate(iis):
                atom[base + off + t] = i * ng + q
    return blocks, atom, 2 * r


def _make_kernel(ng: int, e_pad: int, w2_pad: np.ndarray,
                 edges: np.ndarray, n_tan: int):
    """Build the kernel for static (ng, padded element count, weights,
    bin edges). ``n_tan`` tangent pairs are co-sorted through the same
    network (jacfwd pushes NX tangents; sorting once for all of them is
    what makes analytic Jacobians through the correlated-k path cheap)."""
    n_elem = ng * ng
    layout = _run_layout(ng)
    if layout is not None:
        run_blocks, _, start_size = layout
        r_run = 1 << (ng.bit_length() - 1)
        stages = _bitonic_stages(e_pad, start_size)
    else:
        run_blocks = None
        stages = _bitonic_stages(e_pad)
    lo_edges = [float(x) for x in edges[:-1]]
    hi_edges = [float(x) for x in edges[1:]]
    with_tangent = n_tan > 0

    def kernel(*refs):
        if with_tangent:
            w2_ref, a_ref, b_ref, da_ref, db_ref, out_ref, dout_ref = refs
        else:
            w2_ref, a_ref, b_ref, out_ref = refs
            da_ref = db_ref = dout_ref = None

        rows = a_ref.shape[0]

        def pair_sum(x, y, fill):
            # (rows, NG) x (rows, NG) -> padded (rows, e_pad) of all sums:
            # chunk i holds x[:, i] + y[:, :] (static concat, no gathers).
            chunks = [x[:, i:i + 1] + y for i in range(ng)]
            chunks.append(
                jnp.full((rows, e_pad - n_elem), fill, dtype=y.dtype)
            )
            return jnp.concatenate(chunks, axis=1)

        def pair_sum_runs(x, y, fill):
            # presorted-runs construction matching _run_layout's atom map:
            # every aligned r_run block comes out sorted, alternating
            # ascending/descending, so the network starts at level 2*r_run.
            r = r_run
            d = ng - r

            def flip(z):
                return jnp.concatenate(
                    [z[:, t:t + 1] for t in range(z.shape[1] - 1, -1, -1)],
                    axis=1,
                )

            y_lo, x_lo = y[:, :r], x[:, :r]
            y_lo_r, x_lo_r = flip(y_lo), flip(x_lo)
            x_hi = x[:, r:ng] if d else None
            x_hi_r = flip(x_hi) if d else None
            pad_full = jnp.full((rows, r), fill, dtype=y.dtype)
            pad_c = jnp.full((rows, r - d), fill, dtype=y.dtype) if d else None
            pieces = []
            for m, (kind, q) in enumerate(run_blocks):
                rev = bool(m & 1)
                if kind == "A":
                    pieces.append(x[:, q:q + 1] + (y_lo_r if rev else y_lo))
                elif kind == "B":
                    pieces.append(y[:, q:q + 1] + (x_lo_r if rev else x_lo))
                elif kind == "C":
                    run = y[:, q:q + 1] + (x_hi_r if rev else x_hi)
                    pieces.append(jnp.concatenate(
                        [pad_c, run] if rev else [run, pad_c], axis=1))
                else:
                    pieces.append(pad_full)
            return jnp.concatenate(pieces, axis=1)

        build = pair_sum if run_blocks is None else pair_sum_runs

        # pad with the largest finite f32 (not inf: the padding rows get
        # inter == 0 exactly, and 0 * finfo.max == 0 while 0 * inf == NaN)
        tau = build(a_ref[:], b_ref[:],
                    np.float32(np.finfo(np.float32).max))
        w = jnp.broadcast_to(w2_ref[:], (rows, e_pad))
        payloads = [w]
        for t in range(n_tan):
            payloads.append(build(da_ref[t], db_ref[t], 0.0))

        # single-sublane lane index: per-stage masks are (1, e_pad) and
        # broadcast along the row axis inside the selects (a full-tile
        # iota + bitwise ops per stage measurably costs VPU time)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, e_pad), 1)

        # --- bitonic co-sort of tau with payloads
        for size, stride in stages:
            m_hi = (lane1 & stride) != 0
            # lanes whose compare-exchange keeps the max: the "high" lane
            # of each pair in ascending blocks, the "low" one in
            # descending blocks
            m_max = m_hi != ((lane1 & size) != 0)

            def partner(x):
                # i^stride: +stride for the low element of each pair,
                # -stride (== +e_pad-stride circularly) for the high one
                return jnp.where(
                    m_hi,
                    pltpu.roll(x, stride, axis=1),
                    pltpu.roll(x, e_pad - stride, axis=1),
                )

            p_tau = partner(tau)
            tau_new = jnp.where(
                m_max, jnp.maximum(tau, p_tau), jnp.minimum(tau, p_tau)
            )
            # exact ties keep both lanes' own payloads (consistent on the
            # two sides of the pair; equal-tau elements are interchangeable
            # in the rebin)
            swap = tau_new != tau
            payloads = [jnp.where(swap, partner(x), x) for x in payloads]
            tau = tau_new

        w_s = payloads[0]
        # --- inclusive prefix sum of sorted weights (log-stride doubling)
        ghi = w_s
        shift = 1
        while shift < e_pad:
            shifted = pltpu.roll(ghi, shift, axis=1)
            ghi = ghi + jnp.where(lane1 >= shift, shifted, 0.0)
            shift *= 2
        glo = ghi - w_s

        # --- interval-overlap rebin into the NG output g-bins; the bin
        # intervals are shared between the primal and every tangent
        cols = [[] for _ in range(1 + n_tan)]
        for j in range(ng):
            inter = jnp.clip(
                jnp.minimum(ghi, hi_edges[j])
                - jnp.maximum(glo, lo_edges[j]),
                0.0,
                None,
            )
            inv_den = 1.0 / jnp.maximum(
                jnp.sum(inter, axis=1, keepdims=True), np.float32(1e-37)
            )
            cols[0].append(
                jnp.sum(inter * tau, axis=1, keepdims=True) * inv_den
            )
            for t in range(n_tan):
                cols[1 + t].append(
                    jnp.sum(inter * payloads[1 + t], axis=1, keepdims=True)
                    * inv_den
                )
        out_ref[:] = jnp.concatenate(cols[0], axis=1)
        for t in range(n_tan):
            dout_ref[t] = jnp.concatenate(cols[1 + t], axis=1)

    return kernel


def _pad_rows(x, rows_pad):
    r = x.shape[0]
    if r == rows_pad:
        return x
    return jnp.pad(x, ((0, rows_pad - r), (0, 0)))


def _tan_row_tile(n_tan: int) -> int:
    """Row tile under the VMEM budget: ~(n_tan + 4) live (rows, e_pad)
    tiles during the co-sort."""
    t = 1024 // (n_tan + 4)
    p = 1 << max(t, 8).bit_length() - 1
    return int(min(max(p, 8), ROW_TILE))


@partial(jax.jit, static_argnames=("del_g_key", "interpret"))
def _combine_pallas(tau_a, tau_b, dta, dtb, del_g_key, interpret=False):
    """Fused primal + tangent combine.

    dta/dtb: None, or stacked tangents (T, R, NG) co-sorted with the
    primal keys in one pass through the network. Returns (out, dout) with
    dout (T, R, NG) or None.
    """
    del_g = np.asarray(del_g_key, dtype=np.float64)
    ng = del_g.shape[0]
    n_elem = ng * ng
    e_pad = 1 << (n_elem - 1).bit_length()  # next power of two
    w_atoms = (del_g[:, None] * del_g[None, :]).reshape(-1)
    layout = _run_layout(ng)
    if layout is not None:
        # lane weights follow the presorted-runs atom map (pad lanes -> 0)
        _, atom, _ = layout
        w2 = np.where(atom >= 0, w_atoms[np.clip(atom, 0, None)], 0.0)
    else:
        w2 = np.zeros(e_pad)
        w2[:n_elem] = w_atoms
    edges = g_bin_edges(del_g)

    n_tan = 0 if dta is None else dta.shape[0]
    row_tile = _tan_row_tile(n_tan) if n_tan else ROW_TILE
    rows = tau_a.shape[0]
    rows_pad = -(-rows // row_tile) * row_tile
    args = [_pad_rows(tau_a, rows_pad), _pad_rows(tau_b, rows_pad)]
    if n_tan:
        pad3 = lambda x: (
            x if x.shape[1] == rows_pad
            else jnp.pad(x, ((0, 0), (0, rows_pad - x.shape[1]), (0, 0)))
        )
        args += [pad3(dta), pad3(dtb)]

    kern = _make_kernel(ng, e_pad, w2, edges, n_tan)
    spec_in = pl.BlockSpec((row_tile, ng), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_w2 = pl.BlockSpec((1, e_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_tan = pl.BlockSpec((n_tan, row_tile, ng), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows_pad, ng), tau_a.dtype)
    spec_out = pl.BlockSpec((row_tile, ng), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w2_arr = jnp.asarray(w2, dtype=tau_a.dtype)[None, :]
    if n_tan:
        dout_shape = jax.ShapeDtypeStruct((n_tan, rows_pad, ng),
                                          tau_a.dtype)
        dspec_out = pl.BlockSpec((n_tan, row_tile, ng),
                                 lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
        out, dout = pl.pallas_call(
            kern,
            grid=(rows_pad // row_tile,),
            in_specs=[spec_w2, spec_in, spec_in, spec_tan, spec_tan],
            out_specs=(spec_out, dspec_out),
            out_shape=(out_shape, dout_shape),
            interpret=interpret,
        )(w2_arr, *args)
        return out[:rows], dout[:, :rows]
    out = pl.pallas_call(
        kern,
        grid=(rows_pad // row_tile,),
        in_specs=[spec_w2, spec_in, spec_in],
        out_specs=spec_out,
        out_shape=out_shape,
        interpret=interpret,
    )(w2_arr, *args)
    return out[:rows], None


def _fused_combine_factory(del_g_key, interpret):
    """custom_vmap-wrapped fused (out, dout) combine for one static
    del_g_key: under jax.jacfwd's tangent vmap, all NX tangents are
    co-sorted through ONE network pass instead of re-sorting per tangent.
    """

    @jax.custom_batching.custom_vmap
    def fused(tau_a, tau_b, dta, dtb):
        out, dout = _combine_pallas(
            tau_a, tau_b, dta[None], dtb[None], del_g_key, interpret
        )
        return out, dout[0]

    @fused.def_vmap
    def _fused_vmap(axis_size, in_batched, tau_a, tau_b, dta, dtb):
        a_b, b_b, da_b, db_b = in_batched
        if not a_b and not b_b:
            # jacfwd case: primals shared, tangents stacked on axis 0
            da = dta if da_b else jnp.broadcast_to(
                dta[None], (axis_size,) + dta.shape)
            db = dtb if db_b else jnp.broadcast_to(
                dtb[None], (axis_size,) + dtb.shape)
            out, dout = _combine_pallas(
                tau_a, tau_b, da, db, del_g_key, interpret
            )
            return (out, dout), (False, True)
        # batched primals: fold the batch axis into rows
        ng = tau_a.shape[-1]

        def flat(x, batched):
            x = x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)
            return x.reshape(-1, ng)

        out, dout = _combine_pallas(
            flat(tau_a, a_b), flat(tau_b, b_b),
            flat(dta, da_b)[None], flat(dtb, db_b)[None],
            del_g_key, interpret,
        )
        out = out.reshape(axis_size, -1, ng)
        dout = dout[0].reshape(axis_size, -1, ng)
        return (out, dout), (True, True)

    return fused


_FUSED_CACHE = {}


def _fused_combine(del_g_key, interpret):
    k = (del_g_key, interpret)
    if k not in _FUSED_CACHE:
        _FUSED_CACHE[k] = _fused_combine_factory(del_g_key, interpret)
    return _FUSED_CACHE[k]


@partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def combine_pair_pallas(tau_a, tau_b, del_g_key, interpret=False):
    """Random-overlap combine of two (R, NG) k-distributions on TPU.

    del_g_key: hashable tuple of g-bin widths (static).
    """
    out, _ = _combine_pallas(tau_a, tau_b, None, None, del_g_key,
                             interpret=interpret)
    return out


@combine_pair_pallas.defjvp
def _combine_jvp(del_g_key, interpret, primals, tangents):
    tau_a, tau_b = primals
    dta, dtb = tangents
    zero = jnp.zeros_like(tau_a)
    dta = zero if isinstance(dta, jax.custom_derivatives.SymbolicZero) else dta
    dtb = zero if isinstance(dtb, jax.custom_derivatives.SymbolicZero) else dtb
    out, dout = _fused_combine(del_g_key, interpret)(tau_a, tau_b, dta, dtb)
    return out, dout


def mix_gas_k_pallas(del_g, k_gas, amounts, interpret=False):
    """Pallas-path equivalent of ops.overlap.mix_gas_k (same skip
    semantics): k_gas (NWAVE, NG, NLAY, NGAS), amounts (NGAS, NLAY) ->
    tau (NWAVE, NG, NLAY)."""
    del_g_np = np.asarray(del_g)
    key = tuple(float(x) for x in del_g_np)
    nwave, ng, nlay, ngas = k_gas.shape

    k_wlg = jnp.transpose(k_gas, (0, 2, 1, 3))  # (NWAVE, NLAY, NG, NGAS)
    tau = k_wlg[..., 0] * amounts[0][None, :, None]
    for i in range(1, ngas):
        tau_b = k_wlg[..., i] * amounts[i][None, :, None]
        mixed = combine_pair_pallas(
            tau.reshape(-1, ng), tau_b.reshape(-1, ng), key, interpret
        ).reshape(nwave, nlay, ng)
        skip_b = (tau_b[..., -1] <= 0.0)[..., None]
        skip_a = (tau[..., -1] <= 0.0)[..., None]
        tau = jnp.where(skip_b, tau, jnp.where(skip_a, tau_b, mixed))
    return jnp.transpose(tau, (0, 2, 1))
