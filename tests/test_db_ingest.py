"""GEISA and ExoMol line-list ingestion (r4 VERDICT item 7).

GEISA: records are generated through format_geisa_records (the active
vintage column table) and round-tripped through BOTH the numpy and the
C++ native fixed-width decoders; linelist_from_geisa must reproduce the
physics columns and consume the db_mappings.json GEISA ids.

ExoMol: a small synthetic .states/.trans/.broad triple with known
energies; the assembled intensities must match the closed-form
S = g'A/(8 pi c nu^2) e^{-c2 E''/T}(1-e^{-c2 nu/T})/Q and the partition
function must equal the direct state sum.
"""

import numpy as np
import pytest

from archnemesis_tpu import native
from archnemesis_tpu.constants import C2_CGS
from archnemesis_tpu.io.exomol import (
    linelist_from_exomol,
    partition_function,
)
from archnemesis_tpu.io.geisa import (
    format_geisa_records,
    linelist_from_geisa,
    parse_geisa,
)
from archnemesis_tpu.io.hitran import radtran_to_geisa

C_CGS = 2.99792458e10


@pytest.fixture(scope="module")
def geisa_bytes():
    rng = np.random.default_rng(7)
    n = 40
    mol, code = radtran_to_geisa(5, 1)  # CO principal
    mol2, code2 = radtran_to_geisa(5, 2)  # 13CO
    rec = {
        "nu": np.sort(rng.uniform(2000.0, 2200.0, n)),
        "sw": 10.0 ** rng.uniform(-26, -20, n),
        "gamma_air": rng.uniform(0.04, 0.09, n).round(4),
        "elower": rng.uniform(0.0, 3000.0, n).round(4),
        "iso_code": np.where(np.arange(n) % 3 == 0, code2, code),
        "mol_id": np.full(n, mol),
        "a_einstein": 10.0 ** rng.uniform(-4, 2, n),
        "n_air": rng.uniform(0.4, 0.9, n).round(2),
        "delta_air": rng.uniform(-0.01, 0.01, n).round(6),
        "gamma_self": rng.uniform(0.05, 0.11, n).round(4),
        "n_self": rng.uniform(0.4, 0.9, n).round(2),
    }
    return rec, format_geisa_records(rec)


def test_geisa_roundtrip_numpy(geisa_bytes):
    rec, buf = geisa_bytes
    out = parse_geisa(buf, use_native=False)
    np.testing.assert_allclose(out["nu"], rec["nu"], atol=5e-7)
    np.testing.assert_allclose(out["sw"], rec["sw"], rtol=1e-4)
    np.testing.assert_allclose(out["gamma_self"], rec["gamma_self"],
                               atol=5e-5)
    np.testing.assert_array_equal(out["mol_id"], rec["mol_id"])
    np.testing.assert_array_equal(out["iso_code"], rec["iso_code"])


@pytest.mark.skipif(not native.available(), reason="C++ decoder not built")
def test_geisa_native_matches_numpy(geisa_bytes):
    _, buf = geisa_bytes
    a = parse_geisa(buf, use_native=False)
    b = parse_geisa(buf, use_native=True)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_linelist_from_geisa(tmp_path, geisa_bytes):
    rec, buf = geisa_bytes
    p = tmp_path / "co_geisa.txt"
    p.write_bytes(buf)
    ll = linelist_from_geisa(str(p), 5, 1)
    _, code2 = radtran_to_geisa(5, 2)
    want = rec["iso_code"] != code2
    assert ll.n_lines == int(want.sum())
    np.testing.assert_allclose(np.sort(rec["nu"][want]), ll.nu, atol=5e-7)
    # broadening rows: [g_self, n_self, d_self, g_amb, n_amb, d_amb]
    order = np.argsort(rec["nu"][want])
    np.testing.assert_allclose(
        ll.broad[3], rec["gamma_air"][want][order], atol=5e-5
    )
    np.testing.assert_allclose(
        ll.broad[5], rec["delta_air"][want][order], atol=5e-7
    )
    assert ll.mass == pytest.approx(27.99491, rel=1e-5)
    # iso_id=0 selects the whole molecule
    ll0 = linelist_from_geisa(str(p), 5, 0)
    assert ll0.n_lines == len(rec["nu"])


@pytest.fixture(scope="module")
def exomol_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("exomol")
    # 4 states: ground + three excited
    states = [
        (1, 0.0, 1.0, 0.0),
        (2, 2143.27, 3.0, 1.0),
        (3, 2147.08, 5.0, 2.0),
        (4, 4260.06, 3.0, 1.0),
    ]
    with open(tmp / "co.states", "w") as f:
        for i, e, g, j in states:
            f.write(f"{i:12d} {e:12.6f} {g:6.1f} {j:7.1f}\n")
    trans = [(2, 1, 1.0e-2), (3, 1, 2.5e-2), (4, 2, 7.5e-3)]
    with open(tmp / "co.trans", "w") as f:
        for iu, il, a in trans:
            f.write(f"{iu:12d} {il:12d} {a:10.4e}\n")
    with open(tmp / "co.broad", "w") as f:
        f.write("a0 0.0700 0.70     0.0\n")
        f.write("a0 0.0650 0.65     1.0\n")
    return tmp, states, trans


def test_exomol_partition_function(exomol_files):
    tmp, states, _ = exomol_files
    e = np.array([s[1] for s in states])
    g = np.array([s[2] for s in states])
    q = partition_function(e, g, [296.0])
    want = np.sum(g * np.exp(-C2_CGS * e / 296.0))
    assert q[0] == pytest.approx(want, rel=1e-12)


def test_linelist_from_exomol(exomol_files):
    tmp, states, trans = exomol_files
    ll = linelist_from_exomol(
        str(tmp / "co.states"), str(tmp / "co.trans"), 5, 1,
        broad_path=str(tmp / "co.broad"),
    )
    assert ll.n_lines == 3
    e = {i: ei for i, ei, _, _ in states}
    g = {i: gi for i, _, gi, _ in states}
    q296 = float(partition_function(
        np.array([s[1] for s in states]), np.array([s[2] for s in states]),
        np.asarray(ll.pf_temp),
    )[0] * 0 + np.interp(296.0, ll.pf_temp, ll.pf_q))
    for iu, il, a in trans:
        nu = e[iu] - e[il]
        k = int(np.argmin(np.abs(ll.nu - nu)))
        s_want = (
            g[iu] * a / (8.0 * np.pi * C_CGS * nu**2)
            * np.exp(-C2_CGS * e[il] / 296.0)
            * (1.0 - np.exp(-C2_CGS * nu / 296.0)) / q296
        )
        assert ll.sw[k] == pytest.approx(s_want, rel=1e-10)
    # J''=0 transition got the J-keyed broad entry, J''=1 the second
    k0 = int(np.argmin(np.abs(ll.nu - 2143.27)))
    assert ll.broad[3, k0] == pytest.approx(0.0700)
    k1 = int(np.argmin(np.abs(ll.nu - (4260.06 - 2143.27))))
    assert ll.broad[3, k1] == pytest.approx(0.0650)


def test_exomol_feeds_lbl_engine(exomol_files):
    """An ExoMol-sourced LineList drives the runtime-LBL kernel."""
    import jax.numpy as jnp

    from archnemesis_tpu.ops.lbl import build_blocks, lbl_cross_section

    tmp, _, _ = exomol_files
    ll = linelist_from_exomol(
        str(tmp / "co.states"), str(tmp / "co.trans"), 5, 1,
    )
    wave = np.linspace(2100.0, 2200.0, 256)
    blocks = build_blocks(wave, ll.nu)
    k = np.asarray(lbl_cross_section(
        ll, blocks, jnp.asarray([250.0]), jnp.asarray([0.1]),
        jnp.asarray([0.9]),
    ))
    assert k.shape == (256, 1)
    assert np.all(np.isfinite(k)) and k.max() > 0
