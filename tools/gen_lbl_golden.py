"""Golden LBL cross-sections from the reference, using the CO line list
bundled in the reference test data.

Uses the Weideman-24 Voigt (voigt_schreier) on the oracle side so the
comparison with the framework's identical Weideman implementation is exact.

Run: python tools/gen_lbl_golden.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

LINE_H5 = "/root/reference/tests/files/linedata/CO_1_ambient_AIR.h5"
OUT = os.path.join(REPO, "tests", "goldens", "co_lbl.npz")


def main():
    from archnemesis.lineshape.voigt_impl.voigt_schreier import voigt_schreier

    ld = ans.LineData_0(
        ID=5, ISO=1,
        LINE_DATABASE=LINE_H5,
        PARTITION_FUNCTION_DATABASE=LINE_H5,
    )
    ld.fetch_partition_fn()
    ld.fetch_linedata()

    wave = np.arange(2000.0, 2300.0, 0.02)
    cases = [(150.0, 0.01, 1.0), (250.0, 0.5, 1.0), (220.0, 2.0, 0.7)]
    ks = []
    for t, p, amb in cases:
        k = ld.add_monochromatic_absorption(
            wave_grid=wave,
            t_calc=t,
            p_calc=p,
            amb_frac=amb,
            wave_unit=0,
            lineshape_fn=voigt_schreier,
            wn_calc_window=25.0,
            wn_approx_window=75.0,
            include_pressure_shift=True,
            use_cache=False,
        )
        ks.append(np.asarray(k))
        print(f"t={t} p={p}: k range [{k.min():.3e}, {k.max():.3e}]")

    np.savez(
        OUT,
        WAVE=wave,
        CASES=np.array(cases),
        K=np.stack(ks, axis=1),  # (NWAVE, NCASE)
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
