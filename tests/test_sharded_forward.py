"""Wave-sharded forward parity on the 8-device virtual CPU mesh.

Both opacity modes (VERDICT r3 item 2):
- correlated-k: the Jupiter deck's windowed k-tables device_put with the
  NWAVE axis sharded (parallel.mesh.shard_ktables_by_wave) through the full
  retrieval-driver forward;
- runtime LBL: the CO deck's line blocks partitioned into per-shard halo'd
  line slices under shard_map (parallel.sharded.shard_runtime_lbl).

Sharded and unsharded runs must agree to near machine precision (f64 on
the CPU mesh; the compute graph is identical, only placement differs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from archnemesis_tpu.parallel.mesh import make_mesh, shard_ktables_by_wave

NDEV = len(jax.devices())

pytestmark = pytest.mark.skipif(
    NDEV < 8, reason="needs the 8-device virtual CPU mesh (conftest)"
)


def test_ktable_deck_forward_sharded_matches():
    from archnemesis_tpu.retrievals import make_retrieval_setup

    deck_dir, run = "tests/fixtures/jupiter_fdret", "cirstest"
    mesh = make_mesh(n_wave=4, n_data=2)

    plain = make_retrieval_setup(deck_dir, run, wave_pad_multiple=4)
    sharded = make_retrieval_setup(
        deck_dir, run, wave_pad_multiple=4,
        ktab_transform=lambda kt: shard_ktables_by_wave(kt, mesh),
    )
    xa = jnp.asarray(plain.sv.xa)
    y0 = np.asarray(jax.jit(plain.forward_fn)(xa))
    with mesh:
        y1 = np.asarray(jax.jit(sharded.forward_fn)(xa))
    np.testing.assert_allclose(y1, y0, rtol=1e-12, atol=np.abs(y0).max() * 1e-14)


@pytest.mark.slow
def test_ktable_deck_jacobian_sharded_matches():
    from archnemesis_tpu.retrievals import make_retrieval_setup

    deck_dir, run = "tests/fixtures/jupiter_fdret", "cirstest"
    mesh = make_mesh(n_wave=8, n_data=1)

    plain = make_retrieval_setup(deck_dir, run, wave_pad_multiple=8)
    sharded = make_retrieval_setup(
        deck_dir, run, wave_pad_multiple=8,
        ktab_transform=lambda kt: shard_ktables_by_wave(kt, mesh),
    )
    xa = jnp.asarray(plain.sv.xa)
    nx = xa.shape[0]
    # three representative Jacobian columns (full jacfwd over 41 tangents
    # costs ~2.5 min on the virtual mesh for the same evidence)
    for ix in (0, nx // 2, nx - 1):
        tangent = jnp.zeros_like(xa).at[ix].set(1.0)
        _, dy0 = jax.jvp(plain.forward_fn, (xa,), (tangent,))
        with mesh:
            _, dy1 = jax.jvp(sharded.forward_fn, (xa,), (tangent,))
        dy0, dy1 = np.asarray(dy0), np.asarray(dy1)
        np.testing.assert_allclose(
            dy1, dy0, rtol=1e-10, atol=np.abs(dy0).max() * 1e-12
        )


def test_runtime_lbl_forward_sharded_matches():
    from archnemesis_tpu.forward import forward_nadir, make_forward_config
    from archnemesis_tpu.io.legacy import load_deck
    from archnemesis_tpu.parallel.sharded import shard_runtime_lbl

    import dataclasses

    deck = load_deck("tests/fixtures/co_runtime", "cirstest")
    st = deck.settings
    nconv = int(deck.geometry.nconv[0])
    vconv = deck.geometry.vconv[:nconv, 0]
    # 512-point sub-grid: sharding parity doesn't need the full band and
    # the XLA LBL panel on the virtual mesh costs ~2 min at 1600 points
    rt = dataclasses.replace(deck.ktables,
                             wave=np.asarray(deck.ktables.wave)[:512])
    rt = rt.windowed(vconv.min(), vconv.max())

    mesh = make_mesh(n_wave=8, n_data=1)
    rt_sh = shard_runtime_lbl(rt, mesh)

    cfg = make_forward_config(
        deck.atmosphere, rt, None, iray=st.iray, ispace=st.ispace,
        gasgiant=True,
    )

    spec0 = np.asarray(forward_nadir(
        deck.atmosphere, deck.layer_config, rt, None, None, deck.surface,
        cfg, emiss_ang=0.0,
    ))
    with mesh:
        spec1 = np.asarray(forward_nadir(
            deck.atmosphere, deck.layer_config, rt_sh, None, None,
            deck.surface, cfg, emiss_ang=0.0,
        ))
    assert np.all(np.isfinite(spec1))
    np.testing.assert_allclose(
        spec1, spec0, rtol=1e-12, atol=np.abs(spec0).max() * 1e-14
    )


@pytest.mark.slow
def test_sharded_lbl_cross_section_unit():
    """Direct kernel-level parity: sharded_lbl_cross_section vs the plain
    panel kernel for one gas, including the shard-boundary halo (lines whose
    75 cm^-1 windows straddle shard edges contribute identically)."""
    from archnemesis_tpu.io.legacy import load_deck
    from archnemesis_tpu.ops.lbl import lbl_cross_section
    from archnemesis_tpu.parallel.sharded import (
        shard_lbl_blocks,
        sharded_lbl_cross_section,
    )

    deck = load_deck("tests/fixtures/co_runtime", "cirstest")
    nconv = int(deck.geometry.nconv[0])
    vconv = deck.geometry.vconv[:nconv, 0]
    rt = deck.ktables.windowed(vconv.min(), vconv.max())
    ll, blocks = rt.line_lists[0], rt.blocks[0]

    t = jnp.asarray([150.0, 210.0, 280.0])
    p = jnp.asarray([0.5, 0.05, 0.005])
    amb = jnp.asarray([0.9, 0.9, 0.9])

    k0 = np.asarray(lbl_cross_section(
        ll, blocks, t, p, amb, use_pallas=False,
        s_floor=rt.s_floor[0],
    ))
    mesh = make_mesh(n_wave=8, n_data=1)
    sh = shard_lbl_blocks(ll, blocks, 8)
    from archnemesis_tpu.parallel.sharded import _place

    sh = _place(sh, mesh)
    with mesh:
        k1 = np.asarray(sharded_lbl_cross_section(
            ll, sh, mesh, t, p, amb, use_pallas=False,
            s_floor=rt.s_floor[0],
        ))
    np.testing.assert_allclose(k1, k0, rtol=1e-12, atol=np.abs(k0).max() * 1e-15)


@pytest.mark.slow
def test_sharded_lbl_pallas_matches_xla():
    """The Pallas VMEM kernel dispatched INSIDE the shard_map body (packed
    line columns hoisted to partition time) matches the XLA panel kernel
    per shard — interpret mode on the CPU mesh (r4 VERDICT item 2)."""
    from archnemesis_tpu.io.legacy import load_deck
    from archnemesis_tpu.ops.lbl import lbl_cross_section
    from archnemesis_tpu.parallel.sharded import (
        _place,
        shard_lbl_blocks,
        sharded_lbl_cross_section,
    )

    deck = load_deck("tests/fixtures/co_runtime", "cirstest")
    nconv = int(deck.geometry.nconv[0])
    vconv = deck.geometry.vconv[:nconv, 0]
    rt = deck.ktables.windowed(vconv.min(), vconv.max())
    ll, blocks = rt.line_lists[0], rt.blocks[0]

    t = jnp.asarray([150.0, 210.0, 280.0])
    p = jnp.asarray([0.5, 0.05, 0.005])
    amb = jnp.asarray([0.9, 0.9, 0.9])

    k0 = np.asarray(lbl_cross_section(
        ll, blocks, t, p, amb, use_pallas=False,
        s_floor=rt.s_floor[0],
    ))
    mesh = make_mesh(n_wave=8, n_data=1)
    sh = _place(shard_lbl_blocks(ll, blocks, 8), mesh)
    with mesh:
        k1 = np.asarray(sharded_lbl_cross_section(
            ll, sh, mesh, t, p, amb, pallas_interpret=True,
            s_floor=rt.s_floor[0],
        ))
        # jacfwd still flows (custom JVP delegates tangents to XLA)
        jfn = lambda tt: sharded_lbl_cross_section(  # noqa: E731
            ll, sh, mesh, tt, p, amb, pallas_interpret=True,
            s_floor=rt.s_floor[0],
        ).sum()
        g1 = np.asarray(jax.jacfwd(jfn)(t))
    g0 = np.asarray(jax.jacfwd(
        lambda tt: lbl_cross_section(
            ll, blocks, tt, p, amb, use_pallas=False,
            s_floor=rt.s_floor[0],
        ).sum()
    )(t))
    np.testing.assert_allclose(k1, k0, rtol=1e-10, atol=0)
    np.testing.assert_allclose(g1, g0, rtol=1e-10, atol=np.abs(g0).max() * 1e-12)
