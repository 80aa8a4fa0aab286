"""A/B microbenchmark of random-overlap combine kernel variants on TPU.

Variants:
  current  — ops/overlap_pallas.py production kernel
  lean     — static masks, max/min compare-exchange, neq-swap payload
  sortonly — lean minus payload co-sort minus rebin (lower bound for sort)
  rollonly — 45 lane-rotations (lower bound for data movement)
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from archnemesis_tpu.ops.overlap import g_bin_edges
from archnemesis_tpu.ops.overlap_pallas import (
    _bitonic_stages,
    combine_pair_pallas,
)

ROW_TILE = 256


def make_lean_kernel(ng, e_pad, w2, edges, mode="full"):
    n_elem = ng * ng
    stages = _bitonic_stages(e_pad)
    lo_edges = [float(x) for x in edges[:-1]]
    hi_edges = [float(x) for x in edges[1:]]

    def kernel(w2_ref, a_ref, b_ref, out_ref):
        rows = a_ref.shape[0]
        y = b_ref[:]
        chunks = [a_ref[:, i:i + 1] + y for i in range(ng)]
        chunks.append(jnp.full((rows, e_pad - n_elem),
                               np.float32(np.finfo(np.float32).max),
                               dtype=y.dtype))
        tau = jnp.concatenate(chunks, axis=1)
        w = jnp.broadcast_to(w2_ref[:], (rows, e_pad))

        if mode == "rollonly":
            acc = tau
            for (size, stride) in stages:
                acc = pltpu.roll(acc, stride, axis=1)
            out_ref[:] = acc[:, :ng]
            return

        # single-sublane lane index; per-stage masks are (1, e_pad) and
        # broadcast along rows inside the selects
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, e_pad), 1)

        for size, stride in stages:
            m_hi = (lane1 & stride) != 0
            m_max = m_hi != ((lane1 & size) != 0)
            p = jnp.where(
                m_hi,
                pltpu.roll(tau, stride, axis=1),
                pltpu.roll(tau, e_pad - stride, axis=1),
            )
            tau_new = jnp.where(m_max, jnp.maximum(tau, p),
                                jnp.minimum(tau, p))
            if mode != "sortonly":
                swap = tau_new != tau
                w_p = jnp.where(
                    m_hi,
                    pltpu.roll(w, stride, axis=1),
                    pltpu.roll(w, e_pad - stride, axis=1),
                )
                w = jnp.where(swap, w_p, w)
            tau = tau_new

        if mode == "sortonly":
            out_ref[:] = tau[:, :ng]
            return

        # prefix sum of sorted weights
        ghi = w
        shift = 1
        while shift < e_pad:
            shifted = pltpu.roll(ghi, shift, axis=1)
            ghi = ghi + jnp.where(lane1 >= shift, shifted, 0.0)
            shift *= 2
        glo = ghi - w

        if mode == "edges":
            # cumulative-edge rebin: S(x) = sum_e tau_e clip(x-glo_e,0,w_e),
            # W(x) likewise; bin_j = (S(hi_j)-S(lo_j)) / (W(hi_j)-W(lo_j)).
            # Shares each interior edge between adjacent bins: 21 edge
            # evaluations instead of 20 bins x 2 clipped interval ends.
            all_edges = lo_edges + [hi_edges[-1]]
            S, W = [], []
            for x in all_edges:
                c = jnp.minimum(jnp.maximum(x - glo, 0.0), w)
                S.append(jnp.sum(c * tau, axis=1, keepdims=True))
                W.append(jnp.sum(c, axis=1, keepdims=True))
            cols = []
            for j in range(ng):
                num = S[j + 1] - S[j]
                den = W[j + 1] - W[j]
                cols.append(num / jnp.maximum(den, np.float32(1e-37)))
            out_ref[:] = jnp.concatenate(cols, axis=1)
            return

        cols = []
        for j in range(ng):
            hi_c = jnp.minimum(ghi, hi_edges[j])
            lo_c = jnp.maximum(glo, lo_edges[j])
            inter = jnp.maximum(hi_c - lo_c, 0.0)
            num = jnp.sum(inter * tau, axis=1, keepdims=True)
            den = jnp.sum(inter, axis=1, keepdims=True)
            cols.append(num / jnp.maximum(den, np.float32(1e-37)))
        out_ref[:] = jnp.concatenate(cols, axis=1)

    return kernel


@partial(jax.jit, static_argnames=("del_g_key", "mode", "row_tile"))
def combine_lean(tau_a, tau_b, del_g_key, mode="full", row_tile=ROW_TILE):
    del_g = np.asarray(del_g_key, dtype=np.float64)
    ng = del_g.shape[0]
    n_elem = ng * ng
    e_pad = 1 << (n_elem - 1).bit_length()
    w2 = np.zeros(e_pad)
    w2[:n_elem] = (del_g[:, None] * del_g[None, :]).reshape(-1)
    edges = g_bin_edges(del_g)

    rows = tau_a.shape[0]
    rows_pad = -(-rows // row_tile) * row_tile
    if rows != rows_pad:
        tau_a = jnp.pad(tau_a, ((0, rows_pad - rows), (0, 0)))
        tau_b = jnp.pad(tau_b, ((0, rows_pad - rows), (0, 0)))

    kern = make_lean_kernel(ng, e_pad, w2, edges, mode)
    spec_in = pl.BlockSpec((row_tile, ng), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_w2 = pl.BlockSpec((1, e_pad), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(rows_pad // row_tile,),
        in_specs=[spec_w2, spec_in, spec_in],
        out_specs=pl.BlockSpec((row_tile, ng), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, ng), tau_a.dtype),
    )(jnp.asarray(w2, dtype=tau_a.dtype)[None, :], tau_a, tau_b)
    return out[:rows]


def main():
    ng = 20
    nrows = 8192 * 71
    x, w = np.polynomial.legendre.leggauss(ng)
    del_g = 0.5 * w
    key = tuple(float(v) for v in del_g)

    rng = np.random.default_rng(0)
    tau_a = jnp.asarray(
        np.sort(np.exp(rng.normal(-2, 2, (nrows, ng))), axis=1),
        dtype=jnp.float32)
    tau_b = jnp.asarray(
        np.sort(np.exp(rng.normal(-2, 2, (nrows, ng))), axis=1),
        dtype=jnp.float32)
    tau_a = jax.device_put(tau_a)
    tau_b = jax.device_put(tau_b)

    def timeit(fn, nrep=3):
        out = fn()
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(nrep):
            out = fn()
        _ = float(jnp.sum(out))
        return (time.perf_counter() - t0) / nrep

    which = sys.argv[1:] or ["check", "current", "lean", "sortonly", "rollonly"]

    if "check" in which:
        ref = combine_pair_pallas(tau_a, tau_b, key)
        lean = combine_lean(tau_a, tau_b, key, "full")
        diff = float(jnp.max(jnp.abs(ref - lean) / jnp.maximum(jnp.abs(ref), 1e-30)))
        print(f"lean-vs-current max rel diff: {diff:.3e}", flush=True)

    variants = {
        "current": lambda: combine_pair_pallas(tau_a, tau_b, key),
        "lean": lambda: combine_lean(tau_a, tau_b, key, "full"),
        "edges": lambda: combine_lean(tau_a, tau_b, key, "edges"),
        "sortonly": lambda: combine_lean(tau_a, tau_b, key, "sortonly"),
        "rollonly": lambda: combine_lean(tau_a, tau_b, key, "rollonly"),
        "lean8": lambda: combine_lean(tau_a, tau_b, key, "full", 8),
        "lean16": lambda: combine_lean(tau_a, tau_b, key, "full", 16),
        "lean32": lambda: combine_lean(tau_a, tau_b, key, "full", 32),
        "lean64": lambda: combine_lean(tau_a, tau_b, key, "full", 64),
        "lean128": lambda: combine_lean(tau_a, tau_b, key, "full", 128),
    }
    for name in which:
        if name not in variants:
            continue
        dt = timeit(variants[name])
        print(f"  {name:10s} {dt*1e3:9.2f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
