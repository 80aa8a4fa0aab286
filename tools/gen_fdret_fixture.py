"""Build tests/fixtures/jupiter_fdret: a reduced Jupiter CIRS nadir deck for
the FULL-retrieval FD-Jacobian parity golden.

The full jupiter_nadir deck (npro=81, 698 channels, 71 layers) makes the
pure-Python reference oracle's NUMERICAL-Jacobian retrieval (NX+1 = 81
forward models per iteration) take ~13 h — unusable as a golden generator.
This deck halves the profile grid (41 levels -> NX=40), keeps the first 200
spectral channels (one contiguous band so the calc wave grid shrinks too),
and uses 40 layers.  Same physics, same formats; the framework and the
reference both read it as an ordinary legacy deck.
"""

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "tests", "fixtures", "jupiter_nadir")
DST = os.path.join(REPO, "tests", "fixtures", "jupiter_fdret")

NCHAN = 200
NLAY = 40


def subsample_ref(src, dst):
    lines = open(src).read().splitlines()
    # header: AMFORM, flag, dims line, NGAS id/iso lines, column header
    ngas = int(lines[2].split()[2 + 1])  # "planet lat npro ngas molwt"? no:
    # dims line is "IPLANET LATITUDE NPRO NGAS (MOLWT)"
    t = lines[2].split()
    npro, ngas = int(t[2]), int(t[3])
    head_end = 3 + ngas + 1  # dims + ngas id lines + column header
    data = lines[head_end : head_end + npro]
    assert len(data) == npro and len(data[-1].split()) >= 3
    keep = data[::2]
    t[2] = str(len(keep))
    lines[2] = "   " + "  ".join(t)
    out = lines[:head_end] + keep
    open(dst, "w").write("\n".join(out) + "\n")
    return npro, len(keep)


def subsample_simple(src, dst, ncol_header=1):
    """aerosol.ref / parah2.ref / testapr.dat: one header line holding NPRO
    (first numeric token after optional comment) then NPRO rows."""
    lines = [ln for ln in open(src).read().splitlines()]
    i0 = 0
    while lines[i0].lstrip().startswith("#"):
        i0 += 1
    t = lines[i0].split()
    npro = int(t[0])
    data = lines[i0 + 1 : i0 + 1 + npro]
    keep = data[::2]
    t[0] = str(len(keep))
    lines[i0] = "     " + "   ".join(t)
    out = lines[: i0 + 1] + keep + lines[i0 + 1 + npro :]
    open(dst, "w").write("\n".join(out) + "\n")


def truncate_spx(src, dst, nchan):
    lines = open(src).read().split("\n")
    toks0 = lines[0].split()
    # FWHM LAT LON NGEOM
    assert int(toks0[3]) == 1, "reduced deck assumes single geometry"
    nconv = int(lines[1].split()[0])
    nav = int(lines[2].split()[0])
    head = lines[:3 + nav]
    chans = lines[3 + nav : 3 + nav + nconv]
    out = [lines[0], f"        {nchan}", lines[2]] + lines[3:3 + nav] + \
        chans[:nchan]
    open(dst, "w").write("\n".join(out) + "\n")


def patch_set(src, dst, nlay):
    out = []
    for ln in open(src).read().splitlines():
        if "Number of atm layers" in ln:
            ln = " Number of atm layers :  %d" % nlay
        out.append(ln)
    open(dst, "w").write("\n".join(out) + "\n")


def main():
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for name in os.listdir(SRC):
        if name in ("phi_chisq.txt", "progress.txt"):
            continue
        shutil.copy(os.path.join(SRC, name), os.path.join(DST, name))
    n0, n1 = subsample_ref(os.path.join(SRC, "cirstest.ref"),
                           os.path.join(DST, "cirstest.ref"))
    subsample_simple(os.path.join(SRC, "aerosol.ref"),
                     os.path.join(DST, "aerosol.ref"))
    subsample_simple(os.path.join(SRC, "parah2.ref"),
                     os.path.join(DST, "parah2.ref"))
    subsample_simple(os.path.join(SRC, "testapr.dat"),
                     os.path.join(DST, "testapr.dat"))
    truncate_spx(os.path.join(SRC, "cirstest.spx"),
                 os.path.join(DST, "cirstest.spx"), NCHAN)
    patch_set(os.path.join(SRC, "cirstest.set"),
              os.path.join(DST, "cirstest.set"), NLAY)
    print(f"wrote {DST}: npro {n0}->{n1}, nchan {NCHAN}, nlay {NLAY}")


if __name__ == "__main__":
    main()
