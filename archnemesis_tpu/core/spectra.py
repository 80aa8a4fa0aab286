"""Opacity-source component pytrees: k-tables, CIA tables, aerosol optics,
surface, stellar spectra.

All table data are traced leaves (so parameterisations may perturb them and
jacfwd flows through); dimensions and gas identities are static metadata.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

from archnemesis_tpu.enums import (
    LowerBoundaryCondition,
    ParaH2Ratio,
    SpectralCalculationMode,
)
from archnemesis_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class KTables:
    """Correlated-k (or LBL, ng=1) tables for all radiatively active gases on
    a common (wave, g, press, temp) grid.

    Mirrors the reference ``Spectroscopy_0`` table state
    (``Spectroscopy_0.py:1448`` read_tables): K(NWAVE,NG,NP,NT,NGAS) in
    cm^2 molecule^-1, PRESS in atm, TEMP in K.
    """

    wave: Any  # (NWAVE,)
    g_ord: Any  # (NG,)
    del_g: Any  # (NG,)
    press: Any  # (NPRESS,) [atm]
    temp: Any  # (NTEMP,) [K]
    k: Any  # (NGAS, NWAVE, NG, NPRESS, NTEMP) [cm^2]
    # host-precomputed f64 log of k (ops.ktab.host_log_ktable), attached
    # by cast_deck on the f32 path so the device never evaluates the
    # ~28-ulp TPU f32 log intrinsic on table values
    logk: Any = None

    fwhm: float = static_field(default=0.0)
    gas_id: Tuple[int, ...] = static_field(default=())
    iso_id: Tuple[int, ...] = static_field(default=())
    ilbl: SpectralCalculationMode = static_field(
        default=SpectralCalculationMode.K_TABLES
    )

    @property
    def ngas(self) -> int:
        return self.k.shape[0]

    @property
    def nwave(self) -> int:
        return self.k.shape[1]

    @property
    def ng(self) -> int:
        return self.k.shape[2]

    @classmethod
    def from_tables(cls, tables, ilbl=SpectralCalculationMode.K_TABLES):
        """Stack per-gas KTableData (io.ktables) onto a shared grid.

        All tables must share wave/g/press/temp grids (the reference enforces
        the same in Spectroscopy_0.read_tables).
        """
        t0 = tables[0]
        for t in tables[1:]:
            if not (
                np.allclose(t.wave, t0.wave)
                and np.allclose(t.press, t0.press)
                and np.allclose(t.temp, t0.temp)
                and np.allclose(t.g_ord, t0.g_ord)
            ):
                raise ValueError("k-tables do not share a common grid")
        return cls(
            wave=t0.wave,
            g_ord=t0.g_ord,
            del_g=t0.del_g,
            press=t0.press,
            temp=t0.temp,
            k=np.stack([t.k for t in tables], axis=0),
            fwhm=float(t0.fwhm),
            gas_id=tuple(int(t.gas_id) for t in tables),
            iso_id=tuple(int(t.iso_id) for t in tables),
            ilbl=ilbl,
        )


@pytree_dataclass
class CIATables:
    """Collision-induced-absorption cross-section tables.

    Mirrors reference ``CIA_0`` state (CIA_0.py:44): K_CIA in
    cm^5 molecule^-2 on (pair, para-H2 fraction, temperature, wavenumber).
    """

    waven: Any  # (NWAVE_CIA,) [cm-1]
    temp: Any  # (NT,)
    frac: Any  # (max(NPARA,1),) para-H2 fractions
    k_cia: Any  # (NPAIR, max(NPARA,1), NT, NWAVE_CIA)

    pair_gas1: Tuple[int, ...] = static_field(default=())
    pair_gas2: Tuple[int, ...] = static_field(default=())
    inormalt: Tuple[int, ...] = static_field(default=())
    npara: int = static_field(default=0)
    inormal: ParaH2Ratio = static_field(default=ParaH2Ratio.EQUILIBRIUM)
    # k_cia premultiplier already applied (power of two; see prescale()).
    k_scale: float = static_field(default=1.0)

    @property
    def npair(self) -> int:
        return self.k_cia.shape[0]

    # The balance factor pairing k_cia ~ 1e-45 cm^5 with TOTAM^2 ~ 1e50
    # cm^-4 (ops/cia.py). 2**134 is exact in float64, so prescaled tables
    # are bit-identical there — and in float32 the raw values are
    # subnormal (flushed/quantized at cast), so any f32 deck MUST carry a
    # prescaled table.
    K_CIA_BALANCE = 2.0**134

    def prescale(self) -> "CIATables":
        """Fold the 2**134 balance factor into k_cia host-side in float64.

        Call before casting a deck to float32 (cast_deck does this): the
        raw ~1e-45 cm^5 molecule^-2 values fall below the f32 normal range
        and would lose their mantissa at cast time, long before
        ops.cia.cia_tau could rescale them.
        """
        import numpy as _np

        residual = self.K_CIA_BALANCE / self.k_scale
        if residual == 1.0:
            return self
        k64 = _np.asarray(self.k_cia, dtype=_np.float64) * residual
        return self.replace(k_cia=k64, k_scale=self.K_CIA_BALANCE)


@pytree_dataclass
class AerosolOptics:
    """Aerosol extinction/scattering cross sections per population
    (reference ``Scatter_0`` .xsc state): cm^2 particle^-1 on a wave grid."""

    wave: Any  # (NWAVE_XSC,)
    kext: Any  # (NWAVE_XSC, NDUST)
    ksca: Any  # (NWAVE_XSC, NDUST)

    @property
    def ndust(self) -> int:
        return self.kext.shape[1]


@pytree_dataclass
class HapkeParams:
    """Hapke (2012) BRDF parameter spectra on their own wave grid
    (reference ``Surface_0.read_hap:1004`` — the .hap file carries NEM
    rows of 11 columns)."""

    vem: Any  # (NEM_HAP,)
    sglalb: Any  # single-scattering albedo w
    k: Any  # porosity coefficient
    bs0: Any  # shadow-hiding opposition amplitude
    hs: Any  # shadow-hiding opposition width
    bc0: Any  # coherent-backscatter amplitude
    hc: Any  # coherent-backscatter width
    roughness: Any  # macroscopic roughness [deg]
    g1: Any  # HG phase asymmetry 1
    g2: Any  # HG phase asymmetry 2
    f: Any  # HG mixing fraction


@pytree_dataclass
class SurfaceSpec:
    """Surface state (reference ``Surface_0``): emissivity spectrum,
    temperature, ground albedo, lower-boundary condition, and the optional
    anisotropic-BRDF parameter blocks (Hapke .hap spectra, Oren–Nayar
    albedo/roughness)."""

    tsurf: Any  # scalar [K] (<=0 means gas giant / no surface)
    vem: Any  # (NEM,) wave grid of emissivity
    emissivity: Any  # (NEM,)
    galb: Any  # scalar ground albedo (<0: use 1-emissivity)
    hapke: Any = None  # Optional[HapkeParams] (lowbc=2)
    on_albedo: Any = None  # Optional (NEM,) Oren–Nayar albedo (lowbc=3)
    on_roughness: Any = None  # Optional (NEM,) Oren–Nayar sigma [deg]

    lowbc: LowerBoundaryCondition = static_field(
        default=LowerBoundaryCondition.THERMAL
    )
    gasgiant: bool = static_field(default=True)


@pytree_dataclass
class StellarSpec:
    """Stellar spectrum (reference ``Stellar_0``): flux at 1 AU-normalised
    grid plus distance scaling."""

    wave: Any  # (NSOL,)
    solspec: Any  # (NSOL,) luminosity spectral density (W (cm-1)-1 or W um-1)
    dist: Any  # scalar [AU]
    radius: Any  # scalar stellar radius [m]

    solexist: bool = static_field(default=False)
    ispace: int = static_field(default=0)


@pytree_dataclass
class EmissionTables:
    """Non-LTE emission-rate tables (reference ``Emissions_0.py:53``):
    K(NWAVE,NT,NEM) emission rates + per-emission gas identities."""

    wave: Any  # (NWAVE_EM,)
    temp: Any  # (NT_EM,)
    k: Any  # (NWAVE_EM, NT_EM, NEM)
    ref_dist: Any  # reference stellar distance per emission (NEM,)

    gas_id: Tuple[int, ...] = static_field(default=())
    iso_id: Tuple[int, ...] = static_field(default=())
    solar_scaling: Tuple[bool, ...] = static_field(default=())


def cast_deck(obj, dtype=np.float32):
    """Cast every floating leaf of a component pytree to ``dtype`` for
    device residency (the float32 TPU production path).

    CIATables nodes are ``prescale()``d host-side first: raw k_cia values
    (~1e-45 cm^5 molecule^-2) sit below the float32 normal range and would
    lose their mantissa at cast time, long before ``ops.cia.cia_tau``
    could rescale them.
    """
    import jax

    dtype = np.dtype(dtype)

    def fix_cia(x):
        if isinstance(x, CIATables) and dtype.itemsize < 8:
            return x.prescale()
        return x

    obj = jax.tree_util.tree_map(
        fix_cia, obj, is_leaf=lambda x: isinstance(x, CIATables)
    )

    def fix_ktab(x):
        # attach the host-f64 log table BEFORE the k cast truncates it
        if (isinstance(x, KTables) and dtype.itemsize < 8
                and x.logk is None):
            from archnemesis_tpu.ops.ktab import host_log_ktable

            return x.replace(logk=host_log_ktable(x.k))
        return x

    obj = jax.tree_util.tree_map(
        fix_ktab, obj, is_leaf=lambda x: isinstance(x, KTables)
    )

    def cast(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            return a.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, obj)
