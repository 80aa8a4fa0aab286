"""HITRAN .par parsing, catalogue mapping, and TIPS partition functions.

Oracle: the reference's FormatHitran160 record parser
(database/datatypes/fixed_width/hitran.py:30-53) applied line-by-line to a
synthetic .par file; mapping entries from database/mappings/hitran.py; TIPS
tables from Data/partition_functions/tips2025.h5 (vendored asset).
"""

import numpy as np
import pytest

from archnemesis_tpu.io.hitran import (
    TIPS_PATH,
    linelist_from_par,
    parse_par,
    radtran_to_geisa,
    radtran_to_hitran,
    read_tips,
)


def _synth_par_lines():
    """Synthetic CO (HITRAN mol 05) .par records in the 160-char format."""
    rng = np.random.default_rng(7)
    lines = []
    quanta = " " * 60
    errrefs = "0" * 6 + " 0 0 0 0 0 0"
    for i in range(40):
        mol = 5
        iso = (i % 3) + 1  # isos 1..3
        nu = 2050.0 + i * 3.17 + rng.uniform(0, 1)
        sw = 10 ** rng.uniform(-24, -20)
        a = 10 ** rng.uniform(-6, 1)
        g_air = rng.uniform(0.03, 0.09)
        g_self = rng.uniform(0.04, 0.1) if i % 5 else 0.0
        el = rng.uniform(0, 2000)
        n_air = rng.uniform(0.5, 0.8)
        delta = rng.uniform(-0.01, 0.01)
        # field-exact widths: 2,1,12,10,10,5,5,10,4,8
        rec = (
            f"{mol:2d}{iso:1d}{nu:12.6f}{sw:10.3E}{a:10.3E}"
            f"{g_air:5.3f}{g_self:5.3f}{el:10.4f}{n_air:4.2f}{delta:8.5f}"
        )
        assert len(rec) == 67, len(rec)
        rec += quanta + errrefs + " " + f"{21.0:7.1f}{19.0:7.1f}"
        assert len(rec) == 160, len(rec)
        lines.append(rec)
    return lines


@pytest.fixture(scope="module")
def par_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("hitran") / "co_synth.par"
    lines = _synth_par_lines()
    p.write_text("\n".join(lines) + "\n")
    return str(p), lines


def test_parse_matches_reference_record_parser(par_file):
    path, lines = par_file
    import sys

    sys.path.insert(0, "tools/numba_stub")
    sys.path.insert(0, "/root/reference")
    from archnemesis.database.datatypes.fixed_width.hitran import (
        FormatHitran160,
    )

    got = parse_par(path)
    for i, ln in enumerate(lines):
        ref = FormatHitran160.get_record_from_str(ln)
        assert got["mol_id"][i] == ref.gas_id
        assert got["local_iso_id"][i] == ref.iso_id
        np.testing.assert_allclose(got["nu"][i], ref.line_wavenumber)
        np.testing.assert_allclose(got["sw"][i], ref.line_strength)
        np.testing.assert_allclose(got["a"][i], ref.einstein_a_coeff)
        np.testing.assert_allclose(got["gamma_amb"][i], ref.gamma_amb)
        np.testing.assert_allclose(got["gamma_self"][i], ref.gamma_self)
        np.testing.assert_allclose(got["elower"][i], ref.e_lower)
        np.testing.assert_allclose(got["n_amb"][i], ref.n_amb)
        np.testing.assert_allclose(got["delta_amb"][i], ref.delta_amb)


def test_mapping_matches_reference():
    import sys

    sys.path.insert(0, "tools/numba_stub")
    sys.path.insert(0, "/root/reference")
    from archnemesis.database.mappings.hitran import (
        radtran_to_hitran as ref_map,
    )
    from archnemesis.database.mappings.geisa import (
        radtran_to_geisa as ref_geisa,
    )

    for k, v in ref_map.items():
        assert radtran_to_hitran(*k) == tuple(v), k
    for k, v in ref_geisa.items():
        got = radtran_to_geisa(*k)
        want = tuple(v) if isinstance(v, (tuple, list)) else (v,)
        assert got == want, k


def test_tips_matches_reference_tables():
    import h5py

    temp, q = read_tips(TIPS_PATH, 5, 2)  # CO iso 2
    with h5py.File(
        "/root/reference/archnemesis/Data/partition_functions/tips2025.h5",
        "r",
    ) as f:
        g = f["partition_function/CO/2/pf_data_0000"]
        np.testing.assert_allclose(np.sort(g["temp"][()]), temp)
    assert np.all(np.diff(temp) > 0)
    assert q.min() > 0


def test_linelist_from_par_runs_lbl(par_file):
    """LineList built from .par drives the runtime LBL engine; iso filter
    and iso-0 all-isotope selection behave."""
    path, lines = par_file
    ll1 = linelist_from_par(path, gas_id=5, iso_id=1)
    ll0 = linelist_from_par(path, gas_id=5, iso_id=0)
    assert ll0.n_lines == len(lines)
    assert ll1.n_lines == sum(1 for ln in lines if ln[2] == "1")
    assert np.all(np.diff(ll1.nu) > 0)

    from archnemesis_tpu.ops.lbl import build_blocks, lbl_cross_section

    wave = np.linspace(2050.0, 2180.0, 2048)
    blocks = build_blocks(wave, ll1.nu)
    k = np.asarray(
        lbl_cross_section(
            ll1, blocks, np.array([180.0, 250.0]), np.array([1e-3, 1e-2]),
            np.array([0.9, 0.9]), use_pallas=False,
        )
    )
    assert np.isfinite(k).all() and k.max() > 0

    # gamma_self==0 records fell back to air broadening
    i0 = [i for i, ln in enumerate(lines) if float(ln[40:45]) == 0.0]
    assert i0, "fixture should include zero self-broadening records"
    g_self = ll0.broad[0]
    assert np.all(g_self > 0)
