"""CIA table readers (.tab Fortran binary and .h5).

Mirrors reference CIA_0.read_ciatable_tab (CIA_0.py:455) / read_ciatable_hdf5
(:585). Units converted from cm^-1 amagat^-2 to cm^5 molecule^-2 on read
(.tab only; .h5 tables already store cm^5).
"""

import numpy as np

from archnemesis_tpu.core.spectra import CIATables
from archnemesis_tpu.enums import ParaH2Ratio

AMAGAT = 2.68675e19  # molecule cm-3

# gas ids (Radtran): H2=39, He=40, N2=22, CH4=6
_H2, _HE, _N2, _CH4 = 39, 40, 22, 6


def read_cia_tab(path: str, dnu: float, npara: int, inormal=ParaH2Ratio.EQUILIBRIUM) -> CIATables:
    from scipy.io import FortranFile

    f = FortranFile(path, "r")
    try:
        if npara != 0:
            npair = 2
            temps = f.read_reals(dtype="float32").astype(np.float64)
            frac = np.abs(f.read_reals(dtype="float32")).astype(np.float64)
            k_h2h2 = f.read_reals(dtype="float32")
            k_h2he = f.read_reals(dtype="float32")
            kcia_list = np.vstack([k_h2h2, k_h2he]).reshape((-1,), order="F")
            g1 = (_H2, _H2)
            g2 = (_H2, _HE)
            inormalt = (int(ParaH2Ratio.EQUILIBRIUM), int(ParaH2Ratio.EQUILIBRIUM))
        else:
            npair = 9
            temps = f.read_reals(dtype="float64")
            kcia_list = f.read_reals(dtype="float32")
            frac = np.zeros(1)
            g1 = (_H2, _H2, _H2, _H2, _H2, _N2, _N2, _CH4, _H2)
            g2 = (_H2, _HE, _H2, _HE, _N2, _CH4, _N2, _CH4, _CH4)
            e, n = int(ParaH2Ratio.EQUILIBRIUM), int(ParaH2Ratio.NORMAL)
            inormalt = (e, e, n, n, e, e, e, e, e)
    finally:
        f.close()

    nt = len(temps)
    nwave = int(len(kcia_list) / nt / npair / max(npara, 1))
    waven = np.linspace(0, dnu * (nwave - 1), nwave)
    # stored order: wave-major, then temp, then para, then pair
    k = np.asarray(kcia_list, dtype=np.float64).reshape(
        nwave, nt, max(npara, 1), npair
    )
    k = np.transpose(k, (3, 2, 1, 0))  # (NPAIR, NPARA1, NT, NWAVE)
    k = k / AMAGAT**2

    return CIATables(
        waven=waven,
        temp=np.asarray(temps, dtype=np.float64),
        frac=frac,
        k_cia=k,
        pair_gas1=g1,
        pair_gas2=g2,
        inormalt=inormalt,
        npara=npara,
        inormal=ParaH2Ratio(inormal),
    )


def read_cia_h5(path: str, inormal=ParaH2Ratio.EQUILIBRIUM) -> CIATables:
    import h5py

    if not path.endswith(".h5"):
        path += ".h5"
    with h5py.File(path, "r") as f:
        npara = int(np.asarray(f.get("NPARA", 0)))
        g1 = tuple(int(x) for x in f["IPAIRG1"][()])
        g2 = tuple(int(x) for x in f["IPAIRG2"][()])
        inormalt = tuple(int(x) for x in f["INORMALT"][()])
        waven = f["WAVEN"][()].astype(np.float64)
        temp = f["TEMP"][()].astype(np.float64)
        frac = f["FRAC"][()].astype(np.float64) if npara != 0 else np.zeros(1)
        k = f["K_CIA"][()].astype(np.float64)
    if k.ndim == 3:
        k = k[:, None, :, :]
    return CIATables(
        waven=waven,
        temp=temp,
        frac=frac,
        k_cia=k,
        pair_gas1=g1,
        pair_gas2=g2,
        inormalt=inormalt,
        npara=npara,
        inormal=ParaH2Ratio(inormal),
    )
