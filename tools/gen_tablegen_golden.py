"""Goldens for the table-generation pipeline: small .lta and .kta tables
produced by the reference calc_lbltable / calc_ktable with the CO test
line data.

Run: python tools/gen_tablegen_golden.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refutils import import_reference  # noqa: E402

ans = import_reference()

GOLDENS = os.path.join(REPO, "tests", "goldens")
TMP = os.path.join(REPO, "tests", "fixtures", "tablegen")
LINE_H5 = "/root/reference/tests/files/linedata/CO_1_ambient_AIR.h5"


def main():
    os.makedirs(TMP, exist_ok=True)
    from archnemesis.Spectroscopy_0 import calc_lbltable, calc_ktable

    lta = os.path.join(TMP, "co_ref.lta")
    calc_lbltable(
        lta, 5, 1,
        3, 1.0e-4, 1.0e-1,        # npress, p0, pn
        2, 150.0, 250.0,          # ntemp, t0, tn
        0, 40, 2140.0, 0.1,       # ispace, nwave, wavemin, delwave
        0,                        # iproc VOIGT
        25.0, 75.0,               # windows
        0.1,                      # self_frac
        LINE_H5, pf_database=LINE_H5, cont_database=LINE_H5,
    )
    print("wrote", lta)

    kta = os.path.join(TMP, "co_ref.kta")
    calc_ktable(
        kta, 5, 1,
        2, 1.0e-4, 1.0e-1,
        2, 150.0, 250.0,
        0, 8, 2140.0, 0.4,        # 8 bins of 0.4 cm-1
        10,                       # ng
        0,                        # iproc VOIGT
        5.0, 10.0,                # small windows to keep the oracle fast
        0.1,                      # self_frac
        LINE_H5, pf_database=LINE_H5, cont_database=LINE_H5,
    )
    print("wrote", kta)


if __name__ == "__main__":
    main()
