"""ans HDF5 database writers + AnsDatabase facade + gated fetch.

Round-trip contract: build_ans_from_par(.par) -> ans store -> AnsDatabase
fetch reproduces linelist_from_par exactly (the reference's equivalent flow
is HITRAN download -> AnsLineDataFile cache -> fetch_line_data,
LineData_0.py:1407,1504).
"""

import numpy as np
import pytest

from archnemesis_tpu.io.ansdb import AnsDatabase, build_ans_from_par
from archnemesis_tpu.io.fetch import FetchError, download, file_in_chunks
from archnemesis_tpu.io.hitran import linelist_from_par

from tests.test_hitran import _synth_par_lines


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("ansdb")
    par = d / "co_synth.par"
    par.write_text("\n".join(_synth_par_lines()) + "\n")
    out = str(d / "co.h5")
    build_ans_from_par(str(par), out, [(5, 1), (5, 2)])
    return str(par), out


def test_roundtrip_matches_par(store):
    par, out = store
    db = AnsDatabase(out)
    for iso in (1, 2):
        want = linelist_from_par(par, 5, iso)
        got = db.fetch_line_data(5, iso)
        np.testing.assert_allclose(got.nu, want.nu)
        np.testing.assert_allclose(got.sw, want.sw)
        np.testing.assert_allclose(got.elower, want.elower)
        np.testing.assert_allclose(got.broad, want.broad)
        np.testing.assert_allclose(got.pf_temp, want.pf_temp)
        np.testing.assert_allclose(got.pf_q, want.pf_q)
        assert got.t_ref == want.t_ref and got.mass == want.mass


def test_windowed_and_smin_fetch(store):
    par, out = store
    db = AnsDatabase(out)
    full = db.fetch_line_data(5, 1)
    lo, hi = float(full.nu[3]), float(full.nu[-3])
    win = db.fetch_line_data(5, 1, wn_min=lo, wn_max=hi)
    assert win.nu.min() >= lo and win.nu.max() <= hi
    assert 0 < win.nu.size < full.nu.size

    smed = float(np.median(full.sw))
    strong = db.fetch_line_data(5, 1, s_min=smed)
    assert strong.sw.min() >= smed
    assert strong.nu.size < full.nu.size
    assert strong.broad.shape[1] == strong.nu.size


def test_fetch_partition_fn(store):
    _, out = store
    t, q = AnsDatabase(out).fetch_partition_fn(5, 1)
    assert t.shape == q.shape and np.all(np.diff(t) > 0) and np.all(q > 0)


def test_download_file_url_and_cache(tmp_path):
    src = tmp_path / "src.bin"
    payload = bytes(range(256)) * 1000
    src.write_bytes(payload)
    url = src.as_uri()

    chunks = list(file_in_chunks(url, chunk_size=4096, encoding=None))
    assert b"".join(chunks) == payload
    assert max(len(c) for c in chunks) <= 4096

    dest = tmp_path / "cache" / "dst.bin"
    p1 = download(url, str(dest), chunk_size=4096)
    assert open(p1, "rb").read() == payload
    # second call hits the local cache (no re-fetch even if the source dies)
    src.unlink()
    p2 = download(url, str(dest))
    assert p2 == p1


def test_fetch_error_is_actionable(tmp_path):
    with pytest.raises(FetchError, match="network egress"):
        list(file_in_chunks((tmp_path / "missing.bin").as_uri(),
                            encoding=None))
