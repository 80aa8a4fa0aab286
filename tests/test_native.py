"""Native (C++) fixed-width decoder vs the vectorised-numpy fallback.

The two decode paths of ``archnemesis_tpu.io.hitran.parse_par`` must produce
bit-identical columns (reference record layout:
database/datatypes/fixed_width/hitran.py).
"""

import numpy as np
import pytest

from archnemesis_tpu import native
from archnemesis_tpu.io.hitran import parse_par


def _ffmt(x, w, p):
    s = f"{x:{w}.{p}f}"
    if len(s) > w:  # Fortran-style leading-zero drop: 0.0676 -> .0676
        s = s.replace("0.", ".", 1)
    assert len(s) == w
    return s


def _synthetic_par(nrec=500, seed=0, width=160):
    rng = np.random.default_rng(seed)
    lines = []
    iso_chars = "1234567890AB"  # includes 2020 extension codes
    for _ in range(nrec):
        mol = int(rng.integers(1, 56))
        iso = iso_chars[rng.integers(0, len(iso_chars))]
        rec = (
            f"{mol:2d}{iso}"
            + _ffmt(rng.uniform(1.0, 12000.0), 12, 6)
            + f"{rng.uniform(1e-32, 1e-19):10.3E}"
            + f"{rng.uniform(1e-6, 1e3):10.3E}"
            + _ffmt(rng.uniform(0.005, 0.3), 5, 4)
            + _ffmt(rng.uniform(0.005, 0.5), 5, 4)
            + _ffmt(rng.uniform(0.0, 9000.0), 10, 4)
            + _ffmt(rng.uniform(-0.5, 1.2), 4, 2)
            + _ffmt(rng.uniform(-0.05, 0.05), 8, 6)
        )
        lines.append(rec + " " * (width - len(rec)))
    return ("\n".join(lines) + "\n").encode()


def test_native_matches_numpy_exactly():
    if not native.available():
        pytest.skip("native library not buildable on this host")
    buf = _synthetic_par(nrec=2000)
    out_native = parse_par(buf, use_native=True)
    out_numpy = parse_par(buf, use_native=False)
    assert set(out_native) == set(out_numpy)
    for key in out_numpy:
        np.testing.assert_array_equal(out_native[key], out_numpy[key])


def test_native_100_char_format():
    if not native.available():
        pytest.skip("native library not buildable on this host")
    buf = _synthetic_par(nrec=64, width=100)
    out_native = parse_par(buf, use_native=True)
    out_numpy = parse_par(buf, use_native=False)
    for key in out_numpy:
        np.testing.assert_array_equal(out_native[key], out_numpy[key])


def test_native_rejects_garbage():
    if not native.available():
        pytest.skip("native library not buildable on this host")
    rec = "not a hitran record at all, just text" + " " * 123
    with pytest.raises(ValueError):
        parse_par((rec + "\n").encode(), use_native=True)


def test_fortran_d_exponent_and_blanks():
    if not native.available():
        pytest.skip("native library not buildable on this host")
    cols = [("v", 0, 12, native.KIND_F64), ("n", 12, 16, native.KIND_I32)]
    buf = b"   1.250D-03  42\n" + b" " * 16 + b"\n"  # blank record: NaN / 0
    out = native.parse_fixed(buf, 17, cols)
    assert out["v"][0] == pytest.approx(1.25e-3)
    assert out["n"][0] == 42
    assert np.isnan(out["v"][1]) and out["n"][1] == 0
