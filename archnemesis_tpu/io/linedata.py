"""Reader for "ans" HDF5 line-data / partition-function files.

Format (reference database/filetypes/ans_line_data_file.py): groups
``line_data/<MOL>/<iso>/line_set_NNNN`` with per-line datasets nu, sw,
elower, a, gamma_self, n_self, and per-broadener gamma_amb/n_amb/delta_amb;
attrs t_ref (K), p_ref (atm), s_min. Partition functions under
``partition_function/<MOL>/<iso>/pf_data_NNNN`` as tabulated (temp, q).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

from archnemesis_tpu import data as refdata
from archnemesis_tpu.constants import C2_CGS


@dataclass
class LineList:
    """All lines of one isotopologue + its partition function."""

    gas_id: int
    iso_id: int
    mol_name: str
    t_ref: float
    p_ref: float
    mass: float  # isotopic molar mass (g/mol)
    abundance: float  # terrestrial isotopic abundance

    nu: np.ndarray  # (N,) line centres [cm-1]
    sw: np.ndarray  # (N,) line intensity at t_ref
    elower: np.ndarray  # (N,) lower-state energy [cm-1]
    stim_ref: np.ndarray  # (N,) stimulated-emission factor at t_ref
    # broadening rows: [gamma_self, n_self, delta_self,
    #                   gamma_amb, n_amb, delta_amb] (one ambient gas)
    broad: np.ndarray  # (6, N)

    pf_temp: np.ndarray
    pf_q: np.ndarray

    @property
    def n_lines(self) -> int:
        return self.nu.shape[0]


def _mol_name(gas_id: int) -> str:
    return refdata.gas_info()[str(gas_id)]["name"]


def read_ans_linedata(path: str, gas_id: int, iso_id: int,
                      ambient: str = "AIR") -> LineList:
    import h5py

    name = _mol_name(gas_id)
    with h5py.File(path, "r") as f:
        grp = f[f"line_data/{name}/{iso_id}"]
        sets = sorted(k for k in grp.keys() if k.startswith("line_set"))
        nus, sws, els, gs, ns, ga, na, da = [], [], [], [], [], [], [], []
        t_ref = p_ref = None
        for s in sets:
            g = grp[s]
            t_ref = float(g.attrs["t_ref"])
            p_ref = float(g.attrs["p_ref"])
            nus.append(g["nu"][()])
            sws.append(g["sw"][()])
            els.append(g["elower"][()])
            gs.append(g["gamma_self"][()])
            ns.append(g["n_self"][()])
            b = g[f"broadeners/{ambient}"]
            ga.append(b["gamma_amb"][()])
            na.append(b["n_amb"][()])
            da.append(b["delta_amb"][()])
        nu = np.concatenate(nus)
        order = np.argsort(nu)
        nu = nu[order]
        sw = np.concatenate(sws)[order]
        elower = np.concatenate(els)[order]
        gamma_self = np.concatenate(gs)[order]
        n_self = np.concatenate(ns)[order]
        gamma_amb = np.concatenate(ga)[order]
        n_amb = np.concatenate(na)[order]
        delta_amb = np.concatenate(da)[order]

        # missing self-broadening falls back to the ambient values
        # (reference ans_line_data_file.py:455-465)
        m = np.isnan(n_self) | (n_self == 0)
        n_self[m] = n_amb[m]
        m = np.isnan(gamma_self) | (gamma_self == 0)
        gamma_self[m] = gamma_amb[m]

        pf = f[f"partition_function/{name}/{iso_id}"]
        pfk = sorted(k for k in pf.keys() if k.startswith("pf_data"))[0]
        pf_temp = pf[f"{pfk}/temp"][()]
        pf_q = pf[f"{pfk}/q"][()]

    stim_ref = 1.0 - np.exp(-C2_CGS * nu / t_ref)
    broad = np.stack(
        [gamma_self, n_self, np.zeros_like(n_self), gamma_amb, n_amb, delta_amb]
    )
    gi = refdata.gas_info()[str(gas_id)]
    iso = gi["isotope"][str(iso_id if iso_id != 0 else 1)]
    return LineList(
        gas_id=gas_id,
        iso_id=iso_id,
        mol_name=name,
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
