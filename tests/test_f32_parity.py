"""float32 forward-model accuracy is measured, not assumed (SURVEY §7 hard
part #1; VERDICT r3 weak #5).

Runs tools/f32_parity.py in a fresh f32 process (the production TPU
precision path: cast_deck with CIA prescale) and asserts the measured
error vs this framework's f64 forwards stays inside the documented bounds.
The bounds are the BASELINE.md "f32 accuracy" table; a regression here
means a kernel lost precision, not that the table was optimistic.
"""

import json
import os
import subprocess
import sys

import pytest

SIDECAR = "tests/goldens/f64_forwards.npz"

BOUNDS = {
    # case -> (max_rel_vs_f64, median_rel_vs_f64)
    "jupiter_nadir_ck": (1.0e-4, 1.0e-5),
    "co_runtime_voigt": (5.0e-5, 2.0e-5),
    "mars_so_lbl": (2.0e-4, 1.0e-5),
}

pytestmark = pytest.mark.skipif(
    not os.path.exists(SIDECAR), reason="f64 sidecar not generated "
    "(JAX_ENABLE_X64=1 python tools/f32_parity.py --cpu --write-f64)"
)


@pytest.fixture(scope="module")
def report():
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "tools/f32_parity.py", "--cpu"],
        capture_output=True, text=True, env=env, timeout=900, check=True,
    )
    recs = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            r = json.loads(line)
            recs[r["case"]] = r
    assert set(recs) == set(BOUNDS), recs.keys()
    return recs


@pytest.mark.parametrize("case", sorted(BOUNDS))
def test_f32_error_within_bounds(report, case):
    r = report[case]
    assert not r["x64"]
    max_bound, med_bound = BOUNDS[case]
    assert r["max_rel_vs_f64"] < max_bound, r
    assert r["med_rel_vs_f64"] < med_bound, r
