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


def _bitonic_stages(n: int):
    """(size, stride) pairs of the full bitonic sorting network for n=2^k."""
    stages = []
    size = 2
    while size <= n:
        stride = size // 2
        while stride >= 1:
            stages.append((size, stride))
            stride //= 2
        size *= 2
    return stages


def _make_kernel(ng: int, e_pad: int, w2_pad: np.ndarray,
                 edges: np.ndarray, with_tangent: bool):
    """Build the kernel for static (ng, padded element count, weights,
    bin edges)."""
    n_elem = ng * ng
    stages = _bitonic_stages(e_pad)
    lo_edges = [float(x) for x in edges[:-1]]
    hi_edges = [float(x) for x in edges[1:]]

    def kernel(*refs):
        if with_tangent:
            w2_ref, a_ref, b_ref, da_ref, db_ref, out_ref, dout_ref = refs
        else:
            w2_ref, a_ref, b_ref, out_ref = refs
            da_ref = db_ref = dout_ref = None

        rows = a_ref.shape[0]

        def pair_sum(x_ref, y_ref, fill):
            # (rows, NG) x (rows, NG) -> padded (rows, e_pad) of all sums:
            # chunk i holds x[:, i] + y[:, :] (static concat, no gathers).
            y = y_ref[:]
            chunks = [x_ref[:, i:i + 1] + y for i in range(ng)]
            chunks.append(
                jnp.full((rows, e_pad - n_elem), fill, dtype=y.dtype)
            )
            return jnp.concatenate(chunks, axis=1)

        # pad with the largest finite f32 (not inf: the padding rows get
        # inter == 0 exactly, and 0 * finfo.max == 0 while 0 * inf == NaN)
        tau = pair_sum(a_ref, b_ref, np.float32(np.finfo(np.float32).max))
        w = jnp.broadcast_to(w2_ref[:], (rows, e_pad))
        payloads = [w]
        if with_tangent:
            payloads.append(pair_sum(da_ref, db_ref, 0.0))

        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, e_pad), 1)

        # --- bitonic co-sort of tau with payloads
        for size, stride in stages:
            is_hi = (lane & stride) != 0
            descending = (lane & size) != 0

            def partner(x):
                # i^stride: +stride for the low element of each pair,
                # -stride (== +e_pad-stride circularly) for the high one
                return jnp.where(
                    is_hi,
                    pltpu.roll(x, stride, axis=1),
                    pltpu.roll(x, e_pad - stride, axis=1),
                )

            p_tau = partner(tau)
            # Mosaic can't select between i1 vectors; XOR via f32 instead.
            ooo = jnp.where(
                is_hi,
                (p_tau > tau).astype(jnp.float32),
                (tau > p_tau).astype(jnp.float32),
            )
            swap = (ooo + descending.astype(jnp.float32)) == 1.0
            tau = jnp.where(swap, p_tau, tau)
            payloads = [
                jnp.where(swap, partner(x), x) for x in payloads
            ]

        w_s = payloads[0]
        # --- inclusive prefix sum of sorted weights (log-stride doubling)
        ghi = w_s
        shift = 1
        while shift < e_pad:
            shifted = pltpu.roll(ghi, shift, axis=1)
            ghi = ghi + jnp.where(lane >= shift, shifted, 0.0)
            shift *= 2
        glo = ghi - w_s

        # --- interval-overlap rebin into the NG output g-bins
        def rebin(values, dst):
            cols = []
            for j in range(ng):
                inter = jnp.clip(
                    jnp.minimum(ghi, hi_edges[j])
                    - jnp.maximum(glo, lo_edges[j]),
                    0.0,
                    None,
                )
                num = jnp.sum(inter * values, axis=1, keepdims=True)
                den = jnp.sum(inter, axis=1, keepdims=True)
                cols.append(num / jnp.maximum(den, np.float32(1e-37)))
            dst[:] = jnp.concatenate(cols, axis=1)

        rebin(tau, out_ref)
        if with_tangent:
            rebin(payloads[1], dout_ref)

    return kernel


def _pad_rows(x, rows_pad):
    r = x.shape[0]
    if r == rows_pad:
        return x
    return jnp.pad(x, ((0, rows_pad - r), (0, 0)))


@partial(jax.jit, static_argnames=("del_g_key", "interpret"))
def _combine_pallas(tau_a, tau_b, dta, dtb, del_g_key, interpret=False):
    del_g = np.asarray(del_g_key, dtype=np.float64)
    ng = del_g.shape[0]
    n_elem = ng * ng
    e_pad = 1 << (n_elem - 1).bit_length()  # next power of two
    w2 = np.zeros(e_pad)
    w2[:n_elem] = (del_g[:, None] * del_g[None, :]).reshape(-1)
    edges = g_bin_edges(del_g)

    with_tangent = dta is not None
    # the tangent variant co-sorts a third payload; halve the row tile to
    # stay inside the 16 MB scoped-VMEM budget of the unrolled network
    row_tile = ROW_TILE // 2 if with_tangent else ROW_TILE
    rows = tau_a.shape[0]
    rows_pad = -(-rows // row_tile) * row_tile
    args = [_pad_rows(tau_a, rows_pad), _pad_rows(tau_b, rows_pad)]
    if with_tangent:
        args += [_pad_rows(dta, rows_pad), _pad_rows(dtb, rows_pad)]

    kern = _make_kernel(ng, e_pad, w2, edges, with_tangent)
    spec_in = pl.BlockSpec((row_tile, ng), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_w2 = pl.BlockSpec((1, e_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows_pad, ng), tau_a.dtype)
    spec_out = pl.BlockSpec((row_tile, ng), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    n_out = 2 if with_tangent else 1
    w2_arr = jnp.asarray(w2, dtype=tau_a.dtype)[None, :]
    outs = pl.pallas_call(
        kern,
        grid=(rows_pad // row_tile,),
        in_specs=[spec_w2] + [spec_in] * len(args),
        out_specs=(spec_out,) * n_out if with_tangent else spec_out,
        out_shape=(out_shape,) * n_out if with_tangent else out_shape,
        interpret=interpret,
    )(w2_arr, *args)
    if with_tangent:
        return outs[0][:rows], outs[1][:rows]
    return outs[:rows], None


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
    out, dout = _combine_pallas(tau_a, tau_b, dta, dtb, del_g_key,
                                interpret=interpret)
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
