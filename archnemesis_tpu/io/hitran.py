"""HITRAN ``.par`` fixed-width line-list parsing + catalogue-id mapping +
TIPS partition functions.

TPU-native counterpart of the reference database layer's HITRAN path
(``database/datatypes/fixed_width/hitran.py`` FormatHitran160/100 column
layout, ``database/mappings/hitran.py`` RADTRAN<->HITRAN isotopologue
mapping, ``Data/partition_functions/tips2025.h5``). The per-line Python
record parsing becomes one vectorised columnar decode: the whole file is
viewed as a (nlines, width) byte matrix and each field is a strided slice
converted in bulk — ~1000x fewer Python-level operations than
record-at-a-time parsing, which matters when building VMEM-resident line
blocks for the Pallas LBL kernel from multi-million-line catalogues.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np

from archnemesis_tpu import data as refdata
from archnemesis_tpu import native
from archnemesis_tpu.constants import C2_CGS
from archnemesis_tpu.io.linedata import LineList

_ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "assets",
)
TIPS_PATH = os.path.join(_ASSET_DIR, "tips2025.h5")

# (name, start, stop) byte columns of the 160-char 2004+ format
# (reference FormatHitran160, fixed_width/hitran.py:3-53)
_COLS_160 = [
    ("mol_id", 0, 2), ("local_iso_id", 2, 3),
    ("nu", 3, 15), ("sw", 15, 25), ("a", 25, 35),
    ("gamma_amb", 35, 40), ("gamma_self", 40, 45),
    ("elower", 45, 55), ("n_amb", 55, 59), ("delta_amb", 59, 67),
]
# the 100-char pre-2004 format shares the first 67 columns
_COLS_100 = _COLS_160


@lru_cache(maxsize=None)
def _mappings():
    with open(os.path.join(_ASSET_DIR, "db_mappings.json")) as f:
        raw = json.load(f)
    return {
        name: {tuple(k): tuple(v) for k, v in pairs}
        for name, pairs in raw.items()
    }


def radtran_to_hitran(gas_id: int, iso_id: int):
    """(RADTRAN gas, iso) -> (HITRAN molecule, local iso) (reference
    database/mappings/hitran.py)."""
    m = _mappings()["radtran_to_hitran"].get((gas_id, iso_id))
    if m is None:
        raise KeyError(f"no HITRAN mapping for gas {gas_id} iso {iso_id}")
    return m


def radtran_to_geisa(gas_id: int, iso_id: int):
    """(RADTRAN gas, iso) -> (GEISA molecule, GEISA iso code) (reference
    database/mappings/geisa.py)."""
    m = _mappings()["radtran_to_geisa"].get((gas_id, iso_id))
    if m is None:
        raise KeyError(f"no GEISA mapping for gas {gas_id} iso {iso_id}")
    return m


def _iso_char_decode(col):
    """HITRAN local iso chars: '1'-'9', '0' means 10, 'A'-'Z' mean 11+."""
    out = np.empty(col.shape, dtype=np.int64)
    digits = (col >= ord("1")) & (col <= ord("9"))
    out[digits] = col[digits] - ord("0")
    out[col == ord("0")] = 10
    letters = col >= ord("A")
    out[letters] = col[letters] - ord("A") + 11
    return out


def parse_par(path_or_bytes, line_width: int | None = None,
              use_native: bool | None = None):
    """Parse a HITRAN ``.par`` file into columnar numpy arrays.

    Handles the 160-char (2004+) and 100-char formats; the physics columns
    occupy the same first 67 bytes in both (reference FormatHitran160 /
    FormatHitran100). Line width is auto-detected from the first line when
    not given. Returns a dict of (N,) arrays.

    Decoding runs on the C++ multithreaded fixed-width engine
    (``native/src/fixed_width.cpp``) when it is buildable/loadable;
    ``use_native=False`` forces the vectorised-numpy fallback (both produce
    identical arrays).
    """
    if isinstance(path_or_bytes, bytes):
        buf = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    buf = buf.replace(b"\r\n", b"\n")
    if not buf.endswith(b"\n"):
        buf += b"\n"
    if line_width is None:
        line_width = buf.index(b"\n")
    stride = line_width + 1
    n = len(buf) // stride
    if n * stride != len(buf):
        raise ValueError(
            f"ragged .par file: {len(buf)} bytes not divisible by "
            f"record width {stride}"
        )

    if use_native is None:
        use_native = native.available()
    if use_native:
        cols = [
            (
                name, a, b,
                native.KIND_I32 if name == "mol_id"
                else native.KIND_ISO_CHAR if name == "local_iso_id"
                else native.KIND_F64,
            )
            for name, a, b in _COLS_160
        ]
        out = native.parse_fixed(buf, stride, cols)
        out["mol_id"] = out["mol_id"].astype(np.int64)
        out["local_iso_id"] = out["local_iso_id"].astype(np.int64)
        return out

    mat = np.frombuffer(buf, dtype=np.uint8).reshape(n, stride)

    def field(start, stop, dtype=float):
        w = stop - start
        col = np.ascontiguousarray(mat[:, start:stop]).view(f"S{w}").ravel()
        return col.astype(dtype)

    out = {}
    for name, a, b in _COLS_160:
        if name == "local_iso_id":
            out[name] = _iso_char_decode(mat[:, a:b].ravel().copy())
        elif name == "mol_id":
            out[name] = field(a, b, np.int64)
        else:
            out[name] = field(a, b, np.float64)
    return out


def read_tips(pf_path: str, gas_id: int, iso_id: int):
    """Tabulated TIPS partition function (temp, q) for one isotopologue
    from a tips2025-format HDF5 file (reference default_pf_base
    Spectroscopy_0.py:70; layout partition_function/<MOL>/<iso>/pf_data_*)."""
    import h5py

    name = refdata.gas_info()[str(gas_id)]["name"]
    with h5py.File(pf_path, "r") as f:
        grp = f[f"partition_function/{name}/{max(iso_id, 1)}"]
        key = sorted(k for k in grp.keys() if k.startswith("pf_data"))[0]
        g = grp[key]
        temp = np.asarray(g["temp"][()], dtype=np.float64)
        q = np.asarray(g["q"][()], dtype=np.float64)
    order = np.argsort(temp)
    return temp[order], q[order]


def linelist_from_par(
    path,
    gas_id: int,
    iso_id: int,
    pf_path: str = TIPS_PATH,
    t_ref: float = 296.0,
    p_ref: float = 1.0,
    s_min: float = 0.0,
) -> LineList:
    """Build a LineList for one RADTRAN (gas, iso) straight from a HITRAN
    ``.par`` file + TIPS partition functions.

    iso_id=0 selects every isotopologue of the molecule (abundance-weighted
    HITRAN intensities; partition function of the principal isotopologue,
    same convention as the reference's iso-0 handling).

    The .par format carries no self temperature-exponent or self shift;
    missing self-broadening parameters fall back to the air values
    (reference ans_line_data_file.py:455-465).
    """
    rec = parse_par(path)
    if iso_id == 0:
        mol, _ = radtran_to_hitran(gas_id, 1)
        mask = rec["mol_id"] == mol
    else:
        mol, liso = radtran_to_hitran(gas_id, iso_id)
        mask = (rec["mol_id"] == mol) & (rec["local_iso_id"] == liso)
    if s_min > 0.0:
        mask &= rec["sw"] >= s_min
    if not mask.any():
        raise ValueError(
            f"no lines for gas {gas_id} iso {iso_id} (HITRAN mol {mol})"
        )

    nu = rec["nu"][mask]
    order = np.argsort(nu)
    nu = nu[order]
    sw = rec["sw"][mask][order]
    elower = rec["elower"][mask][order]
    gamma_amb = rec["gamma_amb"][mask][order]
    n_amb = rec["n_amb"][mask][order]
    delta_amb = rec["delta_amb"][mask][order]
    gamma_self = rec["gamma_self"][mask][order]

    # fallbacks for missing self parameters
    m = ~np.isfinite(gamma_self) | (gamma_self == 0)
    gamma_self = np.where(m, gamma_amb, gamma_self)
    n_self = n_amb.copy()

    pf_temp, pf_q = read_tips(pf_path, gas_id, iso_id)

    gi = refdata.gas_info()[str(gas_id)]
    iso = gi["isotope"][str(iso_id if iso_id != 0 else 1)]
    stim_ref = 1.0 - np.exp(-C2_CGS * nu / t_ref)
    broad = np.stack(
        [gamma_self, n_self, np.zeros_like(n_self),
         gamma_amb, n_amb, delta_amb]
    )
    return LineList(
        gas_id=gas_id,
        iso_id=iso_id,
        mol_name=gi["name"],
        t_ref=t_ref,
        p_ref=p_ref,
        mass=float(iso["mass"]),
        abundance=float(iso["abun"]),
        nu=nu,
        sw=sw,
        elower=elower,
        stim_ref=stim_ref,
        broad=broad,
        pf_temp=pf_temp,
        pf_q=pf_q,
    )
