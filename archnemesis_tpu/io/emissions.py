"""Readers/writers for emission look-up table HDF5 files.

File format matches the reference exactly (``Emissions_0.write_table_hdf5``
``Emissions_0.py:432``): one file per emission with datasets NGAS/ID/ISO/
EMTYPE/ISPACE/NWAVE/WAVE/NT/TEMP/K/RATE_COEFF/DIST_REF. The runname.h5 input
group ``Emissions`` (``Emissions_0.py:205-270``) carries NEM and LOCATION
only; all table content lives in the per-emission files.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from archnemesis_tpu.core.emissions import EmissionTables
from archnemesis_tpu.enums import EmissionType, WaveUnit


def _h5_scalar(ds):
    v = ds[()]
    return v.item() if hasattr(v, "item") and np.ndim(v) == 0 else v


def read_emission_tables(paths: Sequence[str], base_dir: str = "") -> EmissionTables:
    """Load per-emission table files and stack them into EmissionTables.

    Equivalent to the reference ``read_header_table_hdf5``
    (``Emissions_0.py:365``) + the per-call K/RATE_COEFF reads inside
    ``calc_rates_hdf5`` (``Emissions_0.py:273``) — the tables are small
    (NWAVE x NT), so we load them once up front instead of re-reading the
    HDF5 file inside every forward evaluation.

    All tables must share the same WAVE/TEMP grids and spectral unit
    (enforced by the reference at ``Emissions_0.py:407-417``).
    """
    import h5py

    wave = temp = None
    ispace = None
    ks, cs, emtypes, gas_ids, iso_ids, dist_refs = [], [], [], [], [], []
    for p in paths:
        fn = p if p.endswith(".h5") else p + ".h5"
        if base_dir and not os.path.isabs(fn):
            fn = os.path.join(base_dir, fn)
        with h5py.File(fn, "r") as f:
            ngas = int(np.atleast_1d(f["NGAS"][()])[0])
            if ngas != 1:
                # same restriction as the reference forward model
                # (ForwardModel_0.py:4050-4058)
                raise NotImplementedError(
                    "only single-gas emissions are supported"
                )
            et = EmissionType(int(_h5_scalar(f["EMTYPE"])))
            w = np.asarray(f["WAVE"][()], dtype=np.float64)
            t = np.asarray(f["TEMP"][()], dtype=np.float64)
            isp = WaveUnit(int(_h5_scalar(f["ISPACE"])))
            if wave is None:
                wave, temp, ispace = w, t, isp
            else:
                if w.shape != wave.shape or not np.allclose(w, wave):
                    raise ValueError("all emission tables must share WAVE")
                if not np.allclose(t, temp):
                    raise ValueError("all emission tables must share TEMP")
                if isp != ispace:
                    raise ValueError("all emission tables must share ISPACE")
            ks.append(np.asarray(f["K"][()], dtype=np.float64))
            if "RATE_COEFF" in f:
                cs.append(np.asarray(f["RATE_COEFF"][()], dtype=np.float64))
            else:
                cs.append(np.ones_like(t))
            emtypes.append(et)
            gas_ids.append(int(np.atleast_1d(f["ID"][()])[0]))
            iso_ids.append(int(np.atleast_1d(f["ISO"][()])[0]))
            dist_refs.append(float(_h5_scalar(f["DIST_REF"])))

    return EmissionTables(
        wave=wave,
        temp=temp,
        k=np.stack(ks, axis=-1),
        rate_coeff=np.stack(cs, axis=-1),
        dist_ref=np.asarray(dist_refs, dtype=np.float64),
        emtype=tuple(emtypes),
        gas_id=tuple(gas_ids),
        iso_id=tuple(iso_ids),
        ispace=ispace,
    )


def read_emissions_group(runfile: str) -> EmissionTables | None:
    """Read the ``Emissions`` group of a runname.h5 input file and load the
    referenced table files (reference ``Emissions_0.read_hdf5``
    ``Emissions_0.py:237``). Returns None when the group is absent/NEM=0."""
    import h5py

    with h5py.File(runfile, "r") as f:
        if "Emissions" not in f:
            return None
        grp = f["Emissions"]
        nem = int(_h5_scalar(grp["NEM"])) if "NEM" in grp else 0
        if nem <= 0:
            return None
        locations = [
            s.decode("ascii") if isinstance(s, bytes) else str(s)
            for s in grp["LOCATION"][()]
        ]
    return read_emission_tables(locations, base_dir=os.path.dirname(runfile))


def write_emission_table(path: str, *, gas_id: int, iso_id: int,
                         emtype: EmissionType, ispace: WaveUnit,
                         wave: np.ndarray, temp: np.ndarray, k: np.ndarray,
                         dist_ref: float, rate_coeff: np.ndarray | None = None):
    """Write one emission table file in the reference's format
    (``Emissions_0.write_table_hdf5`` ``Emissions_0.py:432``)."""
    import h5py

    fn = path if path.endswith(".h5") else path + ".h5"
    if os.path.exists(fn):
        os.remove(fn)
    with h5py.File(fn, "w") as f:
        f.create_dataset("NGAS", data=np.int32(1))
        f.create_dataset("ID", data=np.asarray([gas_id], dtype="int32"))
        f.create_dataset("ISO", data=np.asarray([iso_id], dtype="int32"))
        f.create_dataset("EMTYPE", data=np.int32(int(emtype)))
        f.create_dataset("ISPACE", data=np.int32(int(ispace)))
        f.create_dataset("NWAVE", data=np.int32(len(wave)))
        f.create_dataset("WAVE", data=np.asarray(wave, dtype=np.float64))
        f.create_dataset("NT", data=np.int32(len(temp)))
        f.create_dataset("TEMP", data=np.asarray(temp, dtype=np.float64))
        f.create_dataset("K", data=np.asarray(k, dtype=np.float64))
        if emtype != EmissionType.FLUORESCENCE:
            if rate_coeff is None:
                raise ValueError(
                    "chemical/photolysis emissions require rate_coeff"
                )
            f.create_dataset(
                "RATE_COEFF", data=np.asarray(rate_coeff, dtype=np.float64)
            )
        f.create_dataset("DIST_REF", data=np.float64(dist_ref))
