"""Pallas random-overlap kernel vs the XLA path (interpreter mode on CPU).

The in-VMEM bitonic co-sort + interval rebin must reproduce the XLA
lax.sort-based combine (ops/overlap.py) — both implement the reference's
resort-rebin rankg (ForwardModel_0.py:5960). Primal parity holds even with
tied keys (tie permutations change element order, not bin measures); the
tangent is only checked ties-free (derivative at a tie is a subgradient and
implementation-defined).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.ops.overlap import _combine_pair, g_bin_edges, mix_gas_k
from archnemesis_tpu.ops.overlap_pallas import (
    combine_pair_pallas,
    mix_gas_k_pallas,
)


@pytest.fixture(scope="module")
def gquad():
    x, w = np.polynomial.legendre.leggauss(10)
    del_g = (0.5 * w).astype(np.float32)
    key = tuple(float(v) for v in del_g)
    w2 = (jnp.asarray(del_g)[:, None] * jnp.asarray(del_g)[None, :]).reshape(-1)
    edges = jnp.asarray(g_bin_edges(del_g))
    return del_g, key, w2, edges


def test_pallas_pair_matches_xla_with_ties(gquad):
    del_g, key, w2, edges = gquad
    ng = del_g.shape[0]
    rng = np.random.default_rng(3)
    ta = np.sort(rng.uniform(0, 4, (64, ng)).astype(np.float32), axis=1)
    tb = np.sort(rng.uniform(0, 2, (64, ng)).astype(np.float32), axis=1)
    ta[:10] = 0.0  # degenerate all-tied rows
    tb[5:15] = 0.0
    out_p = np.asarray(
        combine_pair_pallas(jnp.asarray(ta), jnp.asarray(tb), key, True)
    )
    out_x = np.asarray(_combine_pair(w2, edges, jnp.asarray(ta), jnp.asarray(tb)))
    np.testing.assert_allclose(out_p, out_x, rtol=2e-5, atol=1e-7)


def test_pallas_jvp_matches_xla_tiesfree(gquad):
    del_g, key, w2, edges = gquad
    ng = del_g.shape[0]
    rng = np.random.default_rng(4)
    ta = np.sort(rng.uniform(0.1, 4, (32, ng)).astype(np.float32), axis=1)
    tb = np.sort(rng.uniform(0.1, 2, (32, ng)).astype(np.float32), axis=1)
    v = rng.standard_normal((32, ng)).astype(np.float32)

    f = lambda a, b: combine_pair_pallas(a, b, key, True)
    g = lambda a, b: _combine_pair(w2, edges, a, b)
    o_p, jv_p = jax.jvp(f, (jnp.asarray(ta), jnp.asarray(tb)),
                        (jnp.asarray(v), jnp.asarray(0.5 * v)))
    o_x, jv_x = jax.jvp(g, (jnp.asarray(ta), jnp.asarray(tb)),
                        (jnp.asarray(v), jnp.asarray(0.5 * v)))
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(jv_p), np.asarray(jv_x),
                               rtol=2e-3, atol=2e-4)


def test_mix_gas_k_pallas_matches_xla(gquad):
    del_g, key, _, _ = gquad
    ng = del_g.shape[0]
    rng = np.random.default_rng(5)
    nwave, nlay, ngas = 16, 5, 3
    k_gas = np.sort(
        rng.uniform(0, 1e-22, (nwave, ng, nlay, ngas)).astype(np.float32),
        axis=1,
    )
    k_gas[:, :, 0, 1] = 0.0  # one gas empty in one layer: skip semantics
    amounts = rng.uniform(1e20, 1e24, (ngas, nlay)).astype(np.float32)
    out_p = np.asarray(
        mix_gas_k_pallas(del_g, jnp.asarray(k_gas), jnp.asarray(amounts),
                         interpret=True)
    )
    out_x = np.asarray(
        mix_gas_k(del_g, jnp.asarray(k_gas), jnp.asarray(amounts),
                  use_pallas=False)
    )
    np.testing.assert_allclose(out_p, out_x, rtol=3e-5, atol=1e-3)


def test_pallas_jacfwd_multi_tangent_matches_xla(gquad):
    """jax.jacfwd through the pallas combine must equal jacfwd through the
    XLA combine — and (structurally) runs ONE multi-tangent kernel via the
    custom_vmap rule instead of re-sorting per basis vector."""
    del_g, key, w2, edges = gquad
    ng = del_g.shape[0]
    rng = np.random.default_rng(11)
    rows = 8
    ta = np.sort(rng.uniform(0.1, 4, (rows, ng)).astype(np.float32), axis=1)
    tb = np.sort(rng.uniform(0.1, 2, (rows, ng)).astype(np.float32), axis=1)
    scale = jnp.ones((), dtype=jnp.float32)

    def f_pallas(s):
        return combine_pair_pallas(jnp.asarray(ta) * s[0],
                                   jnp.asarray(tb) * s[1], key, True)

    def f_xla(s):
        return _combine_pair(w2, edges, jnp.asarray(ta) * s[0],
                             jnp.asarray(tb) * s[1])

    s0 = jnp.asarray([1.0, 1.0], dtype=jnp.float32)
    jp = np.asarray(jax.jacfwd(f_pallas)(s0))
    jx = np.asarray(jax.jacfwd(f_xla)(s0))
    np.testing.assert_allclose(jp, jx, rtol=2e-4, atol=1e-6)


def test_run_layout_coverage_and_invariant():
    """The presorted-runs construction must (a) cover every (i, j) atom
    exactly once and (b) satisfy the bitonic post-level-r invariant for
    sorted inputs: each aligned r-block sorted, ascending in even blocks,
    descending in odd blocks."""
    from archnemesis_tpu.ops.overlap_pallas import _run_layout

    rng = np.random.default_rng(0)
    for ng in (4, 8, 10, 16, 20):
        blocks, atom, start = _run_layout(ng)
        r = start // 2
        used = atom[atom >= 0]
        assert sorted(used.tolist()) == list(range(ng * ng))
        a = np.sort(rng.uniform(0, 5, ng))
        b = np.sort(rng.uniform(0, 3, ng))
        fill = np.finfo(np.float32).max
        safe = np.clip(atom, 0, None)
        v = np.where(atom >= 0, a[safe // ng] + b[safe % ng], fill)
        for m in range(len(v) // r):
            blk = np.diff(v[m * r:(m + 1) * r])
            assert np.all(blk >= 0) if m % 2 == 0 else np.all(blk <= 0)


def test_pallas_pair_ng20_matches_xla():
    """Production NG=20 shape through the presorted-runs network."""
    x, w = np.polynomial.legendre.leggauss(20)
    del_g = (0.5 * w).astype(np.float32)
    key = tuple(float(v) for v in del_g)
    w2 = (jnp.asarray(del_g)[:, None] * jnp.asarray(del_g)[None, :]).reshape(-1)
    edges = jnp.asarray(g_bin_edges(del_g))
    rng = np.random.default_rng(7)
    ta = np.sort(rng.uniform(0, 4, (48, 20)).astype(np.float32), axis=1)
    tb = np.sort(rng.uniform(0, 2, (48, 20)).astype(np.float32), axis=1)
    ta[:5] = 0.0
    out_p = np.asarray(
        combine_pair_pallas(jnp.asarray(ta), jnp.asarray(tb), key, True)
    )
    out_x = np.asarray(_combine_pair(w2, edges, jnp.asarray(ta), jnp.asarray(tb)))
    np.testing.assert_allclose(out_p, out_x, rtol=2e-5, atol=1e-7)


def test_pallas_vmap_over_batched_primals(gquad):
    """vmap over batched primals AND tangents folds the batch into rows
    (the custom_vmap fallback branch)."""
    del_g, key, w2, edges = gquad
    ng = del_g.shape[0]
    rng = np.random.default_rng(12)
    B, rows = 3, 4
    ta = np.sort(rng.uniform(0.1, 4, (B, rows, ng)).astype(np.float32), -1)
    tb = np.sort(rng.uniform(0.1, 2, (B, rows, ng)).astype(np.float32), -1)

    def f(a, b):
        out, _ = jax.jvp(
            lambda x, y: combine_pair_pallas(x, y, key, True),
            (a, b), (a * 0.1, b * 0.2))
        return out

    out_v = np.asarray(jax.vmap(f)(jnp.asarray(ta), jnp.asarray(tb)))
    for i in range(B):
        out_i = np.asarray(f(jnp.asarray(ta[i]), jnp.asarray(tb[i])))
        np.testing.assert_allclose(out_v[i], out_i, rtol=2e-5, atol=1e-7)
