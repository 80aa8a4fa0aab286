"""Reader for "ans" HDF5 line-data / partition-function files.

Format (reference database/filetypes/ans_line_data_file.py): groups
``line_data/<MOL>/<iso>/line_set_NNNN`` with per-line datasets nu, sw,
elower, a, gamma_self, n_self, and per-broadener gamma_amb/n_amb/delta_amb;
attrs t_ref (K), p_ref (atm), s_min. Partition functions under
``partition_function/<MOL>/<iso>/pf_data_NNNN`` as tabulated (temp, q).
"""

from __future__ import annotations

import os

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


def read_ans_pseudo_continuum(path: str, gas_id: int, iso_id: int,
                              ambient: str = "AIR",
                              temperature: float | None = None,
                              pf_temp=None, pf_q=None):
    """Read an "ans" pseudo-continuum HDF5 file into a PseudoContinuum.

    Layout (reference database/filetypes/ans_pseudo_continuum_file.py):
    groups ``pseudo_continuum/<MOL>/<iso>/pc_data_NNNN`` with datasets
    wn_bin_center/wn_bin_width/line_strength_sum/
    line_strength_weighted_mean_lower_energy_state/..._gamma_self/..._n_self
    and per-broadener ``broadeners/<GAS>`` subgroups; attrs t_cont, s_max,
    p_ref. Leaf selection follows the reference (:280-302): leaves are
    ordered by (s_max, t_cont); the best t_cont is the lowest one >= the
    target temperature (last leaf when none qualifies or no target given).
    Missing broadener data falls back to the self coefficients (:590-596).
    """
    import h5py

    from archnemesis_tpu.ops.pseudo_continuum import PseudoContinuum

    name = _mol_name(gas_id)
    with h5py.File(path, "r") as f:
        grp = f[f"pseudo_continuum/{name}/{iso_id}"]
        leaves = sorted(k for k in grp.keys() if k.startswith("pc_data"))
        if temperature is not None:
            best = None
            for k in leaves:
                tc = float(grp[k].attrs["t_cont"])
                if tc >= temperature and (
                    best is None or tc < float(grp[best].attrs["t_cont"])
                ):
                    best = k
            leaf = best if best is not None else leaves[-1]
        else:
            leaf = leaves[-1]
        g = grp[leaf]
        t_cont = float(g.attrs["t_cont"])
        p_ref = float(g.attrs.get("p_ref", 1.0))
        gamma_self = np.asarray(
            g["line_strength_weighted_gamma_self"][()], dtype=np.float64
        )
        n_self = np.asarray(
            g["line_strength_weighted_n_self"][()], dtype=np.float64
        )
        if "broadeners" in g and ambient in g["broadeners"]:
            b = g[f"broadeners/{ambient}"]
            gamma_amb = np.asarray(
                b["line_strength_weighted_gamma_amb"][()], dtype=np.float64
            )
            n_amb = np.asarray(
                b["line_strength_weighted_n_amb"][()], dtype=np.float64
            )
        else:
            gamma_amb, n_amb = gamma_self, n_self

        pc_kwargs = dict(
            wn_bin_center=np.asarray(g["wn_bin_center"][()],
                                     dtype=np.float64),
            wn_bin_width=np.asarray(g["wn_bin_width"][()],
                                    dtype=np.float64),
            strength_sum=np.asarray(g["line_strength_sum"][()],
                                    dtype=np.float64),
            lsw_e_lower=np.asarray(
                g["line_strength_weighted_mean_lower_energy_state"][()],
                dtype=np.float64,
            ),
        )

    gi = refdata.gas_info()[str(gas_id)]
    iso = gi["isotope"][str(iso_id if iso_id != 0 else 1)]
    if pf_temp is None:
        # partition function comes from the PF database (same as the line
        # list's); a flat Q disables the Q-ratio scaling
        pf_temp, pf_q = np.array([1.0, 1.0e4]), np.array([1.0, 1.0])
    return PseudoContinuum(
        t_ref=t_cont,
        p_ref=p_ref,
        mass=float(iso["mass"]),
        abundance=float(iso["abun"]),
        lsw_gamma_self=gamma_self,
        lsw_n_self=n_self,
        lsw_gamma_amb=gamma_amb,
        lsw_n_amb=n_amb,
        pf_temp=np.asarray(pf_temp, dtype=np.float64),
        pf_q=np.asarray(pf_q, dtype=np.float64),
        **pc_kwargs,
    )


@dataclass
class RuntimeLBL:
    """Runtime line-by-line spectroscopy (the reference's ILBL=1 RUNTIME
    ``.lls`` format, Spectroscopy_0.py:960-1270): per-gas line lists +
    lineshape parameters on a fixed wave grid.

    Duck-types the ``KTables`` interface the forward model consumes
    (wave / del_g / gas_id / iso_id / ilbl) so it can be passed in the
    ``ktab`` slot; ``layer_optical_depths`` dispatches on ``ilbl``.
    """

    wave: np.ndarray
    gas_id: tuple
    iso_id: tuple
    line_lists: tuple  # per gas: LineList
    lineshape: tuple  # per gas: "voigt" | "gaussian" | "lorentz"
    wn_calc_window: tuple
    wn_approx_window: tuple
    s_floor: tuple
    include_pressure_shift: tuple
    blocks: tuple = ()  # per gas: LblBlocks (built lazily for a wave grid)
    # per gas: PseudoContinuum (ops.pseudo_continuum) or None; weak-line
    # continuum added when include_continuum is set (reference
    # INCLUDE_CONTINUUM / DBASE_PC, Spectroscopy_0.py:975-1010)
    pseudo_continuum: tuple = ()
    include_lines: tuple = ()
    include_continuum: tuple = ()

    # multi-chip: per-gas ShardedLblData + mesh (parallel/sharded.py
    # shard_runtime_lbl); empty -> single-device synthesis
    shard_data: tuple = ()
    mesh: object = None

    del_g: np.ndarray = None
    ilbl: int = 1  # SpectralCalculationMode.LINE_BY_LINE_RUNTIME

    def __post_init__(self):
        if self.del_g is None:
            self.del_g = np.array([1.0])
        n = len(self.gas_id)
        if not self.pseudo_continuum:
            self.pseudo_continuum = (None,) * n
        if not self.include_lines:
            self.include_lines = (True,) * n
        if not self.include_continuum:
            self.include_continuum = (True,) * n

    @property
    def ngas(self):
        return len(self.gas_id)

    def windowed(self, wavemin, wavemax):
        """Restrict the LINE LISTS to [wavemin, wavemax] and build the
        static line blocks on the (full) calc grid.

        Mirrors the reference's runtime read_tables (Spectroscopy_0.py:
        1468-1485): the wave grid stays the full .lls WAVE grid, but lines
        are fetched only inside the per-geometry ILS range — lines just
        outside it do NOT contribute their wings.
        """
        import dataclasses

        from archnemesis_tpu.ops.lbl import build_blocks

        lls = tuple(
            _slice_lines(ll, wavemin, wavemax) for ll in self.line_lists
        )
        blocks = tuple(
            build_blocks(self.wave, ll.nu,
                         wn_approx_window=self.wn_approx_window[i])
            for i, ll in enumerate(lls)
        )
        return dataclasses.replace(self, line_lists=lls, blocks=blocks)


def _slice_lines(ll: LineList, wavemin: float, wavemax: float) -> LineList:
    import dataclasses

    sel = (ll.nu >= wavemin) & (ll.nu <= wavemax)
    return dataclasses.replace(
        ll,
        nu=ll.nu[sel], sw=ll.sw[sel], elower=ll.elower[sel],
        stim_ref=ll.stim_ref[sel], broad=ll.broad[:, sel],
    )


# integer values follow the reference SpectroscopicLineProfileEnum
# (enum/spectroscopic_line_profile_enum.py: VOIGT=0, LORENTZ=4,
# SUBLORENTZ_CO2_BROADENING_VENUS=7, DOPPLER=12); names accepted too
_LINESHAPE_NAMES = {
    0: "voigt", 4: "lorentz", 7: "tonkov96_sublorentz_co2_venus",
    12: "gaussian",
    "VOIGT": "voigt", "LORENTZ": "lorentz", "DOPPLER": "gaussian",
    "GAUSSIAN": "gaussian",
    "SUBLORENTZ_CO2_BROADENING_VENUS": "tonkov96_sublorentz_co2_venus",
    "HARTMANN_CH4_H2": "hartmann_ch4_h2",
    "VOIGT_CH4_H2": "voigt_ch4_h2",
}


def read_lls_runtime(path: str) -> RuntimeLBL:
    """Parse a RUNTIME-format .lls file (reference Spectroscopy_0.py:960:
    WAVE/DBASE_*/LINESHAPE/WN_*_WINDOW/AMB_GAS/MOL blocks with
    flow-downwards defaults)."""
    base_dir = os.path.dirname(os.path.abspath(path))
    wave_spec = None
    cur = dict(
        ld=None, pf=None, pc=None, lineshape="voigt", wn_calc=25.0,
        wn_approx=75.0, amb="AIR", s_floor=0.0, shift=True,
        inc_lines=True, inc_cont=True,
    )
    gases = []

    def resolve(p):
        p = p.replace("ARCHNEMESIS_PATH",
                      os.environ.get("ARCHNEMESIS_PATH", "/root/reference"))
        return p if os.path.isabs(p) else os.path.join(base_dir, p)

    for raw in open(path):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key = line.split()[0]
        if key == "WAVE":
            wave_spec = tuple(float(x) for x in line.split()[1:])
        elif key in ("DBASE_PF",):
            cur["pf"] = resolve(line.split(maxsplit=1)[1])
        elif key == "DBASE_LD":
            cur["ld"] = resolve(line.split(maxsplit=1)[1])
        elif key == "DBASE_PC":
            cur["pc"] = resolve(line.split(maxsplit=1)[1])
        elif key == "LINESHAPE":
            v = line.split()[1]
            cur["lineshape"] = _LINESHAPE_NAMES[v if not v.isdigit() else int(v)]
        elif key == "WN_CALC_WINDOW":
            cur["wn_calc"] = float(line.split()[1])
        elif key == "WN_APPROX_WINDOW":
            cur["wn_approx"] = float(line.split()[1])
        elif key == "AMB_GAS":
            cur["amb"] = line.split()[1]
        elif key == "S_FLOOR":
            cur["s_floor"] = float(line.split()[1])
        elif key == "INCLUDE_PRESSURE_SHIFT":
            cur["shift"] = line.split()[1].upper() in ("TRUE", "T", "1")
        elif key == "INCLUDE_LINES":
            cur["inc_lines"] = line.split()[1].upper() in ("TRUE", "T", "1")
        elif key == "INCLUDE_CONTINUUM":
            cur["inc_cont"] = line.split()[1].upper() in ("TRUE", "T", "1")
        elif key == "MOL":
            parts = line.split()
            name_or_id = parts[1]
            gid = None
            info = refdata.gas_info()
            for k, v in info.items():
                if v["name"] == name_or_id:
                    gid = int(k)
                    break
            if gid is None:
                gid = int(name_or_id)
            iso = int(parts[2])
            gases.append((gid, iso, dict(cur)))
        elif key == "END_BLOCK":
            pass

    if wave_spec is None:
        raise ValueError(f"{path}: RUNTIME .lls must define WAVE")
    wave = np.arange(*wave_spec, dtype=float)

    lls, shapes, wcs, was, sfs, shifts = [], [], [], [], [], []
    pcs, incl, incc = [], [], []
    for gid, iso, c in gases:
        lls.append(read_ans_linedata(c["ld"], gid, iso if iso != 0 else 1,
                                     ambient=c["amb"]))
        shapes.append(c["lineshape"])
        wcs.append(c["wn_calc"])
        was.append(c["wn_approx"])
        sfs.append(c["s_floor"])
        shifts.append(c["shift"])
        incl.append(c["inc_lines"])
        incc.append(c["inc_cont"])
        if c["pc"] is not None and c["inc_cont"]:
            pcs.append(read_ans_pseudo_continuum(
                c["pc"], gid, iso if iso != 0 else 1, ambient=c["amb"],
                pf_temp=lls[-1].pf_temp, pf_q=lls[-1].pf_q,
            ))
        else:
            pcs.append(None)

    return RuntimeLBL(
        wave=wave,
        gas_id=tuple(g for g, _, _ in gases),
        iso_id=tuple(i for _, i, _ in gases),
        line_lists=tuple(lls),
        lineshape=tuple(shapes),
        wn_calc_window=tuple(wcs),
        wn_approx_window=tuple(was),
        s_floor=tuple(sfs),
        include_pressure_shift=tuple(shifts),
        pseudo_continuum=tuple(pcs),
        include_lines=tuple(incl),
        include_continuum=tuple(incc),
    )
