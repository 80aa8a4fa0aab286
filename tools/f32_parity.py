"""Quantify float32 forward-model error (SURVEY §7 hard part #1).

Runs the deck forwards in the CURRENT jax precision and reports, per case,
the max/median relative error vs (a) the stored f64 reference-oracle golden
and (b) this framework's own f64 result (sidecar file, written when run
with x64 enabled).

Usage:
    JAX_ENABLE_X64=1 python tools/f32_parity.py --write-f64   # sidecar
    python tools/f32_parity.py                                # f32 report

Cases:
- jupiter_nadir_ck: correlated-k + CIA nadir thermal emission (418-ch CIRS
  deck; golden tests/goldens/jupiter_oe.npz YN at XN)
- co_runtime_voigt: runtime Voigt line-by-line synthesis (the flagged f32
  risk — line strengths span ~40 decades; golden co_runtime_fm.npz)
- mars_so_lbl: LBL-table solar-occultation transmission batch over 15
  tangent heights (f32-vs-f64 only; the stored golden targets the
  forward-level harness in test_forward_so, not the retrieval driver)

Emits one JSON line per case: {"case", "n", "max_rel_vs_golden",
"med_rel_vs_golden", "max_rel_vs_f64", "backend", "x64"}.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

SIDECAR = os.path.join(REPO, "tests", "goldens", "f64_forwards.npz")


def case_jupiter_nadir():
    import jax.numpy as jnp

    from archnemesis_tpu.retrievals import make_retrieval_setup

    import jax

    d = np.load("tests/goldens/jupiter_oe.npz")
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    s = make_retrieval_setup("tests/fixtures/jupiter_nadir", "cirstest",
                             cast_dtype=dtype)
    yn = np.asarray(jax.jit(s.forward_fn)(jnp.asarray(np.asarray(d["XN"]))))
    return yn, np.asarray(d["YN"])


def case_co_runtime():
    import jax.numpy as jnp

    from archnemesis_tpu.retrievals import make_retrieval_setup

    d = np.load("tests/goldens/co_runtime_fm.npz")
    s = make_retrieval_setup("tests/fixtures/co_runtime", "cirstest")
    import jax
    yn = np.asarray(jax.jit(s.forward_fn)(jnp.asarray(s.sv.xa)))
    nconv = int(d["NCONV"][0])
    return yn, np.asarray(d["SPECONV"][:nconv, 0])


def case_mars_so():
    import jax.numpy as jnp

    from archnemesis_tpu.retrievals import make_retrieval_setup_so

    s = make_retrieval_setup_so("tests/fixtures/mars_so", "mars_solocc")
    import jax
    yn = np.asarray(jax.jit(s.forward_fn)(jnp.asarray(s.sv.xa)))
    return yn, None


CASES = {
    "jupiter_nadir_ck": case_jupiter_nadir,
    "co_runtime_voigt": case_co_runtime,
    "mars_so_lbl": case_mars_so,
}


def rel_err(a, b):
    scale = np.abs(b).max()
    return np.abs(a - b) / np.maximum(np.abs(b), 1e-3 * scale)


def main():
    write_f64 = "--write-f64" in sys.argv
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    if "--x64" in sys.argv or write_f64:
        jax.config.update("jax_enable_x64", True)
    x64 = bool(jax.config.jax_enable_x64)
    backend = jax.default_backend()
    if write_f64 and not x64:
        raise SystemExit("--write-f64 needs JAX_ENABLE_X64=1")

    sidecar = {}
    if os.path.exists(SIDECAR) and not write_f64:
        sidecar = dict(np.load(SIDECAR))

    out_f64 = {}
    for name, fn in CASES.items():
        yn, golden = fn()
        rec = {"case": name, "n": int(yn.size), "backend": backend,
               "x64": x64}
        if golden is not None:
            r = rel_err(yn, golden)
            rec["max_rel_vs_golden"] = float(r.max())
            rec["med_rel_vs_golden"] = float(np.median(r))
        if name in sidecar:
            r = rel_err(yn, sidecar[name])
            rec["max_rel_vs_f64"] = float(r.max())
            rec["med_rel_vs_f64"] = float(np.median(r))
        out_f64[name] = yn.astype(np.float64)
        print(json.dumps(rec))

    if write_f64:
        np.savez(SIDECAR, **out_f64)
        print(f"# wrote {SIDECAR}")


if __name__ == "__main__":
    main()
