"""NEMESIS correlated-k (.kta) and line-by-line (.lta) binary table readers.

Host-side numpy I/O (no JAX): tables are loaded once into a pytree and then
live on device. Format mirrors the reference readers
(``Spectroscopy_0.py:2492`` read_ktahead, ``:2733`` read_ktable, ``:2451``
read_ltahead, ``:2626`` read_lbltable): little-endian float32/int32 stream,
k packed as float32 × 1e20.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from archnemesis_tpu.utils.path_redirect import resolve_path

K_PACK_FACTOR = 1.0e20  # reference database/filetypes/lbltable.py:28


@dataclass
class KTableData:
    """One gas's k-table (or LBL table with ng=1) in physical units.

    k has shape (nwave, ng, npress, ntemp), cm^2 molecule^-1.
    press in atm, temp in K.
    """

    gas_id: int
    iso_id: int
    wave: np.ndarray
    fwhm: float
    g_ord: np.ndarray
    del_g: np.ndarray
    press: np.ndarray
    temp: np.ndarray
    k: np.ndarray


def _read_kta_header(f):
    irec0 = int(np.fromfile(f, dtype="<i4", count=1)[0])
    nwave = int(np.fromfile(f, dtype="<i4", count=1)[0])
    vmin = np.round(np.float64(np.fromfile(f, dtype="<f4", count=1)[0]), 7)
    delv = np.round(np.float64(np.fromfile(f, dtype="<f4", count=1)[0]), 7)
    fwhm = float(np.fromfile(f, dtype="<f4", count=1)[0])
    npress = int(np.fromfile(f, dtype="<i4", count=1)[0])
    ntemp = int(np.fromfile(f, dtype="<i4", count=1)[0])
    ng = int(np.fromfile(f, dtype="<i4", count=1)[0])
    gas_id = int(np.fromfile(f, dtype="<i4", count=1)[0])
    iso_id = int(np.fromfile(f, dtype="<i4", count=1)[0])
    g_ord = np.fromfile(f, dtype="<f4", count=ng).astype(np.float64)
    del_g = np.fromfile(f, dtype="<f4", count=ng).astype(np.float64)
    np.fromfile(f, dtype="<f4", count=2)  # legacy padding
    press = np.fromfile(f, dtype="<f4", count=npress).astype(np.float64)
    temp = np.fromfile(f, dtype="<f4", count=ntemp).astype(np.float64)
    if delv > 0.0:
        wave = np.linspace(vmin, delv * (nwave - 1) + vmin, nwave)
    else:
        wave = np.fromfile(f, dtype="<f4", count=nwave).astype(np.float64)
    return irec0, nwave, fwhm, npress, ntemp, ng, gas_id, iso_id, g_ord, del_g, press, temp, wave


def read_kta(path: str, wavemin: float = -np.inf, wavemax: float = np.inf) -> KTableData:
    """Read a .kta table, keeping only waves in [wavemin, wavemax]
    (mirrors the reference's windowed read, Spectroscopy_0.py:2733)."""
    if not path.endswith(".kta"):
        path += ".kta"
    with open(path, "rb") as f:
        (irec0, nwave, fwhm, npress, ntemp, ng, gas_id, iso_id,
         g_ord, del_g, press, temp, wave) = _read_kta_header(f)
        sel = np.where((wave >= wavemin) & (wave <= wavemax))[0]
        if sel.size == 0:
            raise ValueError(
                f"{path}: no table waves in [{wavemin}, {wavemax}]"
            )
        f.seek((npress * ntemp * ng * sel[0] + (irec0 - 1)) * 4, 0)
        raw = np.fromfile(f, dtype="<f4", count=sel.size * npress * ntemp * ng)
    k = raw.astype(np.float64).reshape(sel.size, npress, ntemp, ng) / K_PACK_FACTOR
    # (nwave, npress, ntemp, ng) -> (nwave, ng, npress, ntemp)
    k = np.transpose(k, (0, 3, 1, 2))
    return KTableData(
        gas_id=gas_id,
        iso_id=iso_id,
        wave=wave[sel],
        fwhm=fwhm,
        g_ord=g_ord,
        del_g=del_g,
        press=press,
        temp=temp,
        k=k,
    )


def read_lta(path: str, wavemin: float = -np.inf, wavemax: float = np.inf) -> KTableData:
    """Read a .lta line-by-line table (ng=1). Mirrors Spectroscopy_0.py:2626."""
    if not path.endswith(".lta"):
        path += ".lta"
    with open(path, "rb") as f:
        irec0 = int(np.fromfile(f, dtype="<i4", count=1)[0])
        nwave = int(np.fromfile(f, dtype="<i4", count=1)[0])
        vmin = np.round(np.float64(np.fromfile(f, dtype="<f4", count=1)[0]), 7)
        delv = np.round(np.float64(np.fromfile(f, dtype="<f4", count=1)[0]), 7)
        npress = int(np.fromfile(f, dtype="<i4", count=1)[0])
        ntemp = int(np.fromfile(f, dtype="<i4", count=1)[0])
        gas_id = int(np.fromfile(f, dtype="<i4", count=1)[0])
        iso_id = int(np.fromfile(f, dtype="<i4", count=1)[0])
        press = np.fromfile(f, dtype="<f4", count=npress).astype(np.float64)
        temp = np.fromfile(f, dtype="<f4", count=ntemp).astype(np.float64)
        wave = np.linspace(vmin, delv * (nwave - 1) + vmin, nwave)
        sel = np.where((wave >= wavemin) & (wave <= wavemax))[0]
        if sel.size == 0:
            raise ValueError(f"{path}: no table waves in [{wavemin}, {wavemax}]")
        f.seek((npress * ntemp * sel[0] + (irec0 - 1)) * 4, 0)
        raw = np.fromfile(f, dtype="<f4", count=sel.size * npress * ntemp)
    k = raw.astype(np.float64).reshape(sel.size, npress, ntemp) / K_PACK_FACTOR
    return KTableData(
        gas_id=gas_id,
        iso_id=iso_id,
        wave=wave[sel],
        fwhm=0.0,
        g_ord=np.array([0.0]),
        del_g=np.array([1.0]),
        press=press,
        temp=temp,
        k=k[:, None, :, :],
    )


def read_kls(path: str, wavemin=-np.inf, wavemax=np.inf):
    """Read a .kls file (list of .kta paths, one per line; reference
    Spectroscopy_0.py read_kls:1249) and load every table."""
    base = os.path.dirname(os.path.abspath(path))
    tables = []
    with open(path) as f:
        for line in f:
            name = line.strip()
            if not name:
                continue
            p = resolve_path(name, base)
            tables.append(read_kta(p, wavemin, wavemax))
    return tables


def read_lls(path: str, wavemin=-np.inf, wavemax=np.inf):
    """Read a .lls file listing .lta tables (ILBL=2 mode)."""
    base = os.path.dirname(os.path.abspath(path))
    tables = []
    with open(path) as f:
        for line in f:
            name = line.strip()
            if not name:
                continue
            p = resolve_path(name, base)
            tables.append(read_lta(p, wavemin, wavemax))
    return tables


def write_kta(path: str, gas_id: int, iso_id: int, g_ord, del_g, press,
              temp, wave, k, fwhm: float = 0.0):
    """Write a .kta correlated-k table (binary layout of the reference
    write_ktable Spectroscopy_0.py:2951: header + g/P/T grids + float32
    packed k in wave->press->temp->g order).

    k: (NWAVE, NG, NPRESS, NTEMP) [cm^2]; wave must be uniform or is
    stored explicitly (delv<=0).
    """
    if not path.endswith(".kta"):
        path += ".kta"
    wave = np.asarray(wave, dtype=np.float64)
    ng, npress, ntemp, nwave = (
        len(g_ord), len(press), len(temp), len(wave)
    )
    dv = np.diff(wave)
    uniform = nwave > 1 and np.allclose(dv, dv[0], rtol=1e-6)
    delv = float(dv[0]) if uniform else -1.0
    irec0 = 10 + 2 * ng + 3 + npress + ntemp + (0 if uniform else nwave)

    with open(path, "wb") as f:
        np.int32(irec0).tofile(f)
        np.int32(nwave).tofile(f)
        np.float32(wave[0]).tofile(f)
        np.float32(delv).tofile(f)
        np.float32(fwhm).tofile(f)
        np.int32(npress).tofile(f)
        np.int32(ntemp).tofile(f)
        np.int32(ng).tofile(f)
        np.int32(gas_id).tofile(f)
        np.int32(iso_id).tofile(f)
        np.asarray(g_ord, dtype="<f4").tofile(f)
        np.asarray(del_g, dtype="<f4").tofile(f)
        np.zeros(2, dtype="<f4").tofile(f)
        np.asarray(press, dtype="<f4").tofile(f)
        np.asarray(temp, dtype="<f4").tofile(f)
        if not uniform:
            np.asarray(wave, dtype="<f4").tofile(f)
        packed = np.transpose(
            np.asarray(k) * K_PACK_FACTOR, (0, 2, 3, 1)
        )  # wave, press, temp, g
        packed.astype("<f4").tofile(f)


def write_lta(path: str, gas_id: int, iso_id: int, press, temp, vmin: float,
              delv: float, k):
    """Write a .lta line-by-line table (reference write_lbltable
    Spectroscopy_0.py:2856). k: (NWAVE, NPRESS, NTEMP) [cm^2]."""
    if not path.endswith(".lta"):
        path += ".lta"
    npress, ntemp = len(press), len(temp)
    nwave = k.shape[0]
    irec0 = 9 + npress + ntemp
    with open(path, "wb") as f:
        np.int32(irec0).tofile(f)
        np.int32(nwave).tofile(f)
        np.float32(vmin).tofile(f)
        np.float32(delv).tofile(f)
        np.int32(npress).tofile(f)
        np.int32(ntemp).tofile(f)
        np.int32(gas_id).tofile(f)
        np.int32(iso_id).tofile(f)
        np.asarray(press, dtype="<f4").tofile(f)
        np.asarray(temp, dtype="<f4").tofile(f)
        (np.asarray(k) * K_PACK_FACTOR).astype("<f4").tofile(f)
