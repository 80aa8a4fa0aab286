"""Forward model: components -> synthetic spectrum (pure, jittable).

This is the TPU-native counterpart of the reference ``ForwardModel_0`` +
``CIRSrad`` orchestration (ForwardModel_0.py:437 nemesisfm, :4376 CIRSrad):
instead of mutable classes and deepcopy-per-eval, a static ``ForwardConfig``
is built once on the host (gas index mappings, enums, quadrature constants),
and ``forward_spectrum`` is a pure function of the component pytrees —
jit/vmap/jacfwd compose directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.core.spectra import (
    AerosolOptics,
    CIATables,
    KTables,
    StellarSpec,
    SurfaceSpec,
)
from archnemesis_tpu.core.types import Atmosphere, LayerConfig
from archnemesis_tpu.enums import (
    PathCalc,
    RayleighScatteringMode,
    SpectralCalculationMode,
    WaveUnit,
)
from archnemesis_tpu.ops.cia import cia_tau
from archnemesis_tpu.ops.dust import dust_tau
from archnemesis_tpu.ops.ktab import interp_ktables
from archnemesis_tpu.ops.overlap import g_bin_edges, mix_gas_k, overlap_nstraddle
from archnemesis_tpu.rt.emission import (
    absorption_spectrum,
    thermal_emission_spectrum,
    transmission_spectrum,
)
from archnemesis_tpu.rt.layer import build_layers
from archnemesis_tpu.rt.path import Paths, nadir_path
from archnemesis_tpu.ops.rayleigh import rayleigh_tau
from archnemesis_tpu.utils.interp import interp1d_extrap

ATM_TO_PA = 101325.0
SQ_CM_TO_SQ_M = 1.0e-4


@dataclass(frozen=True)
class ForwardConfig:
    """Static (compile-time) forward-model configuration.

    Built once on the host by ``make_forward_config``; hashable so it can be
    closed over by jit.
    """

    ispace: WaveUnit
    iray: RayleighScatteringMode
    spec_gas_idx: Tuple[int, ...]  # spectroscopy gas -> atmosphere column
    pair_q1: Tuple[int, ...]  # CIA pair -> atmosphere column of gas 1
    pair_q2: Tuple[int, ...]
    pair_active: Tuple[int, ...]
    ray_gas_idx: Tuple[Tuple[str, int], ...]  # for IRAY=4 (h2/he/ch4/nh3)
    # per spectroscopy gas: atmosphere columns sharing its gas id (self-
    # broadening fraction for runtime LBL, ForwardModel_0.py:3822-3828)
    amb_self_cols: Tuple[Tuple[int, ...], ...]
    del_g: Tuple[float, ...]  # static copy for overlap setup
    gasgiant: bool = True
    nstraddle: int = 2
    # atmosphere columns of CO2/N2/H2 for the analytic NIR CIA bands
    # (reference species scan, ForwardModel_0.py:4560-4584); -1 = absent
    ico2: int = -1
    in2: int = -1
    ih2: int = -1
    # multiple-scattering wave-tile size: production grids are
    # lax.map'ed over tiles of this many waves (live memory bounded by
    # the tile; the reference's analog is its per-wave Python loop,
    # Multiple_Scattering_Core.py:790).  128 measured fastest on the
    # v5e (16.6k vs 12.5k gp/s at 256 — the tile working set stays
    # core-resident; BASELINE.md r5 scattering table).  Grids <= the
    # tile run untiled.
    scat_wave_tile: int = 128

    @property
    def del_g_np(self):
        return np.asarray(self.del_g)


def _locate_gas(gas_id, iso_id, atm_ids, atm_isos):
    for i, (g, s) in enumerate(zip(atm_ids, atm_isos)):
        if g == gas_id and s == iso_id:
            return i
    return None


def make_forward_config(
    atm: Atmosphere,
    ktab: KTables,
    cia: Optional[CIATables],
    iray: RayleighScatteringMode,
    ispace: WaveUnit = WaveUnit.Wavenumber_cm,
    gasgiant: bool = True,
) -> ForwardConfig:
    """Resolve static gas mappings (reference locate_gas Atmosphere_0.py:1152
    and the CIA pair resolution ForwardModel_0.py:4700-4716)."""
    spec_idx = []
    for g, s in zip(ktab.gas_id, ktab.iso_id):
        i = _locate_gas(g, s, atm.gas_id, atm.iso_id)
        if i is None:
            raise ValueError(f"spectroscopy gas {g} iso {s} not in atmosphere")
        spec_idx.append(i)

    # gas-coverage warning (reference check_gas_spec_atm
    # ForwardModel_0.py:296-348): atmosphere gases without spectroscopy
    # data contribute no opacity
    uncovered = [
        (g, s)
        for g, s in zip(atm.gas_id, atm.iso_id)
        if not any(
            kg == g and (ks == s or ks == 0 or s == 0)
            for kg, ks in zip(ktab.gas_id, ktab.iso_id)
        )
    ]
    if uncovered:
        import logging

        logging.getLogger(__name__).info(
            "atmosphere gases without spectroscopy data (no line/band "
            "opacity contribution): %s", uncovered)

    pair_q1, pair_q2, pair_active = [], [], []
    if cia is not None:
        for p in range(len(cia.pair_gas1)):
            g1, g2 = cia.pair_gas1[p], cia.pair_gas2[p]

            def find(g):
                cols = [i for i, x in enumerate(atm.gas_id) if x == g]
                if len(cols) > 1:
                    cols = [
                        i
                        for i in cols
                        if atm.iso_id[i] == 1
                    ]
                return cols[0] if len(cols) == 1 else None

            i1, i2 = find(g1), find(g2)
            active = i1 is not None and i2 is not None
            if active and cia.inormalt[p] is not None:
                # INORMAL-dependent pairs participate only when their flag
                # matches the run INORMAL (ForwardModel_0.py:4732-4749)
                inormal_dependent = _pair_is_inormal_dependent(cia, p)
                if inormal_dependent and cia.inormalt[p] != cia.inormal:
                    active = False
            pair_q1.append(i1 if i1 is not None else 0)
            pair_q2.append(i2 if i2 is not None else 0)
            pair_active.append(1 if active else 0)

    amb_self_cols = tuple(
        tuple(i for i, ag in enumerate(atm.gas_id) if ag == g)
        for g in ktab.gas_id
    )

    ray_idx = []
    names = {39: "h2", 40: "he", 6: "ch4", 11: "nh3"}
    for i, (g, s) in enumerate(zip(atm.gas_id, atm.iso_id)):
        if g in names and s in (0, 1) and names[g] not in dict(ray_idx):
            ray_idx.append((names[g], i))

    # species columns for the analytic NIR CIA bands (reference scan keeps
    # the LAST match, ForwardModel_0.py:4560-4584)
    ico2 = in2 = ih2 = -1
    for i, (g, s) in enumerate(zip(atm.gas_id, atm.iso_id)):
        if g == 39 and s in (0, 1):
            ih2 = i
        elif g == 22:
            in2 = i
        elif g == 2 and s in (0, 1):
            ico2 = i

    return ForwardConfig(
        ispace=WaveUnit(ispace),
        iray=RayleighScatteringMode(iray),
        spec_gas_idx=tuple(spec_idx),
        pair_q1=tuple(pair_q1),
        pair_q2=tuple(pair_q2),
        pair_active=tuple(pair_active),
        ray_gas_idx=tuple(ray_idx),
        amb_self_cols=amb_self_cols,
        del_g=tuple(float(x) for x in np.asarray(ktab.del_g)),
        gasgiant=gasgiant,
        nstraddle=overlap_nstraddle(np.asarray(ktab.del_g)),
        ico2=ico2,
        in2=in2,
        ih2=ih2,
    )


def _pair_is_inormal_dependent(cia: CIATables, p: int) -> bool:
    """A pair is INORMAL-dependent if the same (gas1,gas2) appears more than
    once in the table (reference locate_INORMAL_pairs CIA_0.py:380)."""
    count = sum(
        1
        for q in range(len(cia.pair_gas1))
        if cia.pair_gas1[q] == cia.pair_gas1[p]
        and cia.pair_gas2[q] == cia.pair_gas2[p]
    )
    return count > 1


def apply_dust_renorm(layers, atm: Atmosphere):
    """Rescale layered dust columns so each flagged mode integrates to the
    model-specified optical depth (reference ForwardModel_0.py:4833-4834:
    CONT[:, i] / sum * 1e4 * DUST_RENORMALISATION[i], set by cloud models
    9/32/47)."""
    if atm.dust_renorm is None:
        return layers
    renorm = jnp.asarray(atm.dust_renorm)
    cont = layers.cont  # (NLAY, NDUST)
    tot = jnp.sum(cont, axis=0)
    scaled = cont / jnp.where(tot > 0.0, tot, 1.0) * 1.0e4 * renorm
    new = jnp.where((renorm > 0.0)[None, :], scaled, cont)
    return layers.replace(cont=new)


def layer_optical_depths(
    cfg: ForwardConfig,
    layers,
    wave,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
):
    """Per-layer vertical optical depths (reference calculate_layer_opacity
    ForwardModel_0.py:3905): gas (correlated-k mixed), CIA, Rayleigh, dust.

    Returns dict with taugas (NWAVE,NG,NLAY), taucia/tauray/taudust/tauscat
    (NWAVE,NLAY), tautot (NWAVE,NG,NLAY).
    """
    press_atm = layers.press / ATM_TO_PA

    # --- gas opacity
    amounts = (
        layers.amount[:, jnp.asarray(cfg.spec_gas_idx)].T * SQ_CM_TO_SQ_M
    )  # (NGAS, NLAY) cm^-2
    if ktab.ilbl == SpectralCalculationMode.LINE_BY_LINE_RUNTIME:
        # on-the-fly Voigt synthesis per gas (reference calc_klbl_online
        # Spectroscopy_0.py:2046 driven by ForwardModel_0.py:3819-3848:
        # per-gas constant ambient fraction from layer-mean VMRs)
        from archnemesis_tpu.ops.lbl import lbl_cross_section

        ave_vmr = jnp.mean(layers.pp / layers.press[:, None], axis=0)
        nlay = layers.nlay
        taugas = 0.0
        for i in range(len(ktab.gas_id)):
            self_frac = jnp.sum(
                ave_vmr[jnp.asarray(cfg.amb_self_cols[i])]
            )
            amb = jnp.broadcast_to(1.0 - self_frac, (nlay,))
            k_i = 0.0
            if ktab.include_lines[i] and ktab.shard_data:
                # wave-sharded synthesis over the device mesh: per-shard
                # halo'd line blocks under shard_map (parallel/sharded.py)
                from archnemesis_tpu.parallel.sharded import (
                    sharded_lbl_cross_section,
                )

                k_i = sharded_lbl_cross_section(
                    ktab.line_lists[i], ktab.shard_data[i], ktab.mesh,
                    layers.temp, press_atm, amb,
                    lineshape=ktab.lineshape[i],
                    s_floor=ktab.s_floor[i],
                    wn_calc_window=ktab.wn_calc_window[i],
                    wn_approx_window=ktab.wn_approx_window[i],
                    include_pressure_shift=ktab.include_pressure_shift[i],
                )  # (NWAVE, NLAY)
            elif ktab.include_lines[i]:
                k_i = lbl_cross_section(
                    ktab.line_lists[i], ktab.blocks[i],
                    layers.temp, press_atm, amb,
                    lineshape=ktab.lineshape[i],
                    s_floor=ktab.s_floor[i],
                    wn_calc_window=ktab.wn_calc_window[i],
                    wn_approx_window=ktab.wn_approx_window[i],
                    include_pressure_shift=ktab.include_pressure_shift[i],
                )  # (NWAVE, NLAY)
            if (
                ktab.include_continuum[i]
                and ktab.pseudo_continuum[i] is not None
            ):
                # weak-line pseudo-continuum (reference
                # add_monochromatic_absorption LineData_0.py:2436-2460)
                from archnemesis_tpu.ops.pseudo_continuum import (
                    pseudo_continuum_k,
                )

                k_i = k_i + pseudo_continuum_k(
                    ktab.pseudo_continuum[i], np.asarray(ktab.wave),
                    layers.temp, press_atm, amb,
                    lineshape=ktab.lineshape[i],
                )
            taugas = taugas + k_i * amounts[i][None, :]
        taugas = taugas[:, None, :]  # NG=1 axis
    elif ktab.ilbl == SpectralCalculationMode.LINE_BY_LINE_TABLES:
        k_gas = interp_ktables(ktab.k, ktab.press, ktab.temp, press_atm, layers.temp, logk=getattr(ktab, "logk", None))
        # monochromatic: plain sum over gases, NG=1
        # (reference ForwardModel_0.py:3796-3818)
        taugas = jnp.einsum("wglr,rl->wgl", k_gas, amounts)
    else:
        # correlated-k random overlap (ForwardModel_0.py:3853-3885)
        k_gas = interp_ktables(ktab.k, ktab.press, ktab.temp, press_atm, layers.temp, logk=getattr(ktab, "logk", None))
        taugas = mix_gas_k(
            cfg.del_g_np, k_gas, amounts, nstraddle=cfg.nstraddle
        )

    q_lay = layers.pp / layers.press[:, None]

    # --- CIA
    if cia is not None:
        taucia = cia_tau(
            cia,
            wave,
            layers.temp,
            layers.frac,
            q_lay,
            layers.totam,
            layers.delh,
            jnp.asarray(cfg.pair_q1),
            jnp.asarray(cfg.pair_q2),
            np.asarray(cfg.pair_active, dtype=np.float64),
            ispace=cfg.ispace,
            ico2=cfg.ico2,
            in2=cfg.in2,
            ih2=cfg.ih2,
        )
    else:
        taucia = jnp.zeros((wave.shape[0], layers.nlay), dtype=layers.temp.dtype)

    # --- Rayleigh
    tauray = rayleigh_tau(
        cfg.iray,
        wave,
        layers.totam,
        vmr_lay=q_lay,
        gas_idx=dict(cfg.ray_gas_idx),
        ispace=cfg.ispace,
    )

    # --- dust
    if aero is not None and aero.ndust > 0:
        taudust, tauscat, tauclscat = dust_tau(
            aero.wave, aero.kext, aero.ksca, wave, layers.cont
        )
    else:
        z = jnp.zeros((wave.shape[0], layers.nlay), dtype=layers.temp.dtype)
        taudust, tauscat, tauclscat = z, z, z[:, :, None] * 0

    tautot = taugas + (taucia + taudust + tauray)[:, None, :]
    return {
        "taugas": taugas,
        "taucia": taucia,
        "tauray": tauray,
        "taudust": taudust,
        "tauscat": tauscat,
        "tauclscat": tauclscat,
        "tautot": tautot,
    }


def path_spectrum(
    cfg: ForwardConfig,
    wave,
    tautot,
    path: Paths,
    surf: Optional[SurfaceSpec],
    del_g,
    emission_layer=None,
):
    """LOS accumulation + IMOD dispatch + g integration (reference CIRSrad
    ForwardModel_0.py:4376-4508). Returns (NWAVE, NPATH).

    ``emission_layer``: optional (NWAVE, NLAY) non-LTE per-layer emitted
    radiance (ops.emissions.layer_emission); gathered onto the path exactly
    like tau (reference EMITOT_LAYINC ForwardModel_0.py:4095).
    """
    tau_layinc = (
        tautot[:, :, path.layinc] * path.scale[None, None, :, :]
    )  # (NWAVE, NG, NLAYIN, NPATH)

    if PathCalc.THERMAL_EMISSION in path.imod:
        if surf is not None and not cfg.gasgiant:
            emissivity = interp1d_extrap(surf.vem, surf.emissivity, wave)
            tsurf = surf.tsurf
        else:
            emissivity = jnp.zeros_like(wave)
            tsurf = jnp.asarray(-1.0, dtype=wave.dtype)
        emission_path = None
        if emission_layer is not None:
            emission_path = (
                emission_layer[:, path.layinc] * path.scale[None, :, :]
            )  # (NWAVE, NLAYIN, NPATH)
        spec = thermal_emission_spectrum(
            wave,
            tau_layinc,
            path.emtemp,
            path.mask,
            tsurf,
            emissivity,
            path.surface_visible,
            cfg.gasgiant,
            emission_path=emission_path,
            ispace=cfg.ispace,
        )
    elif PathCalc.ABSORBTION in path.imod:
        # 1 - transmission, useful for small transmissions (reference
        # calculate_absorption_spectrum ForwardModel_0.py:4127-4136)
        tau_total = jnp.sum(tau_layinc * path.mask[None, None, :, :], axis=2)
        spec = absorption_spectrum(tau_total)
    elif not (
        (PathCalc.MULTIPLE_SCATTERING
         | PathCalc.SINGLE_SCATTERING_PLANE_PARALLEL) & path.imod
    ):
        tau_total = jnp.sum(tau_layinc * path.mask[None, None, :, :], axis=2)
        spec = transmission_spectrum(tau_total)
    else:
        raise NotImplementedError(f"IMOD {path.imod} not yet implemented")

    return jnp.einsum("wgp,g->wp", spec, del_g)


def so_tangent_layers(baseh_m: np.ndarray, tanhe_km: np.ndarray):
    """Unique tangent (bottom) layers bracketing each measured tangent height
    (reference calc_path_SO ForwardModel_0.py:3240-3258). Host-side static.
    """
    nlay = baseh_m.shape[0]
    baseh_km = np.asarray(baseh_m) / 1.0e3
    itanhe = []
    for th in np.atleast_1d(tanhe_km):
        ibase = int(np.argmin(np.abs(baseh_km - th)))
        if baseh_km[ibase] <= th:
            ibasel, ibaseh = ibase, min(ibase + 1, nlay - 1)
        else:
            ibasel, ibaseh = ibase - 1, ibase
        itanhe += [ibasel, ibaseh]
    return np.unique(itanhe)


def forward_limb(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    cfg: ForwardConfig,
    tanhe_km,
    return_diagnostics: bool = False,
):
    """Limb thermal-emission forward evaluation at one tangent height.

    Mirrors the reference nemesisfm path for EMISS_ANG<0 (ForwardModel_0.py
    :505-508 + calc_path :2996-2998): the layering is re-based at the
    tangent height (LAYHT=tanhe, LAYANG=90) and a single mirrored limb path
    through all layers feeds the thermal-emission integral (no surface).

    ``tanhe_km`` is traced — vmap over it to batch FOV tangent points.
    """
    from archnemesis_tpu.rt.path import limb_paths

    layers = apply_dust_renorm(
        build_layers(atm, laycfg, layang=90.0,
                     layht_override=tanhe_km * 1.0e3),
        atm,
    )
    paths = limb_paths(
        layers, atm.radius, atm.h[-1], [0],
        imod=PathCalc.THERMAL_EMISSION,
    )
    wave = ktab.wave
    taus = layer_optical_depths(cfg, layers, wave, ktab, cia, aero)
    spec = path_spectrum(cfg, wave, taus["tautot"], paths, None, ktab.del_g)
    if return_diagnostics:
        return spec, {"layers": layers, "paths": paths, **taus}
    return spec


def so_geometry(atm: Atmosphere, laycfg: LayerConfig, tanhe_km,
                lfm_bracket: bool = False):
    """Host-side static SO geometry: tangent-layer selection + the linear
    tangent-height interpolation stencil (reference calc_path_SO
    ForwardModel_0.py:3240-3258 and nemesisSOfm :943-961).

    Computed once at setup from the unperturbed layering — the reference
    likewise freezes layer heights for SO (adjust_hydrostat=False,
    ForwardModel_0.py:855).

    ``lfm_bracket=True`` reproduces nemesisLfm's bracket choice
    (ForwardModel_0.py:1322-1329): there ``base0 = BASEH_TANHE[ibase]/1e3``
    divides the already-km tangent baseline by 1e3 again, so the
    lower/upper bracket is almost always [ibase, ibase+1] with
    (possibly extrapolating) weights — kept verbatim for output parity
    with the reference limb forward model.
    """
    layers = build_layers(atm, laycfg, layang=90.0)
    baseh = np.asarray(layers.baseh)
    itanhe = so_tangent_layers(baseh, tanhe_km)
    baseh_tan = baseh[itanhe] / 1.0e3  # (NPATH,) km
    npath = len(itanhe)

    tanhe = np.atleast_1d(np.asarray(tanhe_km))
    lo, hi, wlo, whi = [], [], [], []
    for th in tanhe:
        ibase = int(np.argmin(np.abs(baseh_tan - th)))
        base0 = baseh_tan[ibase] / 1.0e3 if lfm_bracket else baseh_tan[ibase]
        if base0 <= th:
            ibasel, ibaseh = ibase, ibase + 1
        else:
            ibasel, ibaseh = ibase - 1, ibase
        if ibaseh > npath - 1:
            lo.append(ibasel)
            hi.append(ibasel)
            wlo.append(1.0)
            whi.append(0.0)
        else:
            fhl = (th - baseh_tan[ibasel]) / (baseh_tan[ibaseh] - baseh_tan[ibasel])
            fhh = (baseh_tan[ibaseh] - th) / (baseh_tan[ibaseh] - baseh_tan[ibasel])
            lo.append(ibasel)
            hi.append(ibaseh)
            wlo.append(1.0 - fhl)
            whi.append(1.0 - fhh)
    return dict(
        itanhe=itanhe,
        lo=np.asarray(lo), hi=np.asarray(hi),
        wlo=np.asarray(wlo), whi=np.asarray(whi),
        baseh_tan=baseh_tan, tanhe_km=tanhe,
    )


def forward_so(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    cfg: ForwardConfig,
    geo: dict,
    return_diagnostics: bool = False,
    tanhe_shift=None,
    solflux=None,
):
    """Solar-occultation forward model: one transmission spectrum per
    measured tangent height (reference nemesisSOfm ForwardModel_0.py:783 +
    calc_path_SO :3181).

    The atmosphere is layered at LAYANG=90; ALL tangent paths are computed
    in one opacity evaluation (the reference's geometry-batching trick, the
    default here); path spectra are interpolated to the measured tangent
    heights with the static stencil from ``so_geometry``.

    ``tanhe_shift`` (km, may be traced — model 777 retrieves it) switches
    the tangent interpolation to a differentiable searchsorted/gather over
    the path tangent heights. ``solflux`` (NWAVE,) multiplies the
    transmission for IFORM=Atmospheric_transmission (reference
    calculate_transmission_spectrum ForwardModel_0.py:4114-4122).
    """
    from archnemesis_tpu.rt.path import limb_paths

    layers = apply_dust_renorm(build_layers(atm, laycfg, layang=90.0), atm)
    paths = limb_paths(
        layers, atm.radius, atm.h[-1], geo["itanhe"],
        imod=PathCalc.PLANCK_FUNCTION_AT_BIN_CENTRE,
    )
    wave = ktab.wave
    taus = layer_optical_depths(cfg, layers, wave, ktab, cia, aero)
    spec = path_spectrum(
        cfg, wave, taus["tautot"], paths, None, ktab.del_g
    )  # (NWAVE, NPATH) transmission

    if tanhe_shift is None:
        specmod = (
            spec[:, jnp.asarray(geo["lo"])] * jnp.asarray(geo["wlo"])[None, :]
            + spec[:, jnp.asarray(geo["hi"])] * jnp.asarray(geo["whi"])[None, :]
        )  # (NWAVE, NGEOM)
    else:
        bt = jnp.asarray(geo["baseh_tan"])  # (NPATH,) km, ascending
        th = jnp.asarray(geo["tanhe_km"]) + tanhe_shift  # (NGEOM,)
        idx = jnp.clip(jnp.searchsorted(bt, th) - 1, 0, bt.shape[0] - 2)
        w = (th - bt[idx]) / (bt[idx + 1] - bt[idx])
        w = jnp.clip(w, 0.0, 1.0)
        specmod = spec[:, idx] * (1.0 - w)[None, :] + spec[:, idx + 1] * w[None, :]
    if solflux is not None:
        specmod = specmod * solflux[:, None]
    if return_diagnostics:
        return specmod, {"layers": layers, "paths": paths, **taus,
                         "spec_paths": spec}
    return specmod


def forward_limb_batch(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    cfg: ForwardConfig,
    geo: dict,
    tanhe_shift=None,
    return_diagnostics: bool = False,
):
    """Limb thermal-emission forward model over all measured tangent
    heights at once (reference nemesisLfm ForwardModel_0.py:1254 +
    calc_path_L :3375): ONE layering at LAYANG=90, one batched opacity
    evaluation feeding every tangent path, and the same tangent-height
    interpolation stencil as the SO driver.  Differs from forward_so only
    in the path physics: THERMAL_EMISSION radiance instead of
    transmission (no solar-flux multiply, no surface term for limb).

    ``tanhe_shift`` (km, traced — model 777) switches to the
    differentiable searchsorted interpolation, as in forward_so.
    """
    from archnemesis_tpu.rt.path import limb_paths

    layers = apply_dust_renorm(build_layers(atm, laycfg, layang=90.0), atm)
    paths = limb_paths(
        layers, atm.radius, atm.h[-1], geo["itanhe"],
        imod=PathCalc.THERMAL_EMISSION,
    )
    wave = ktab.wave
    taus = layer_optical_depths(cfg, layers, wave, ktab, cia, aero)
    spec = path_spectrum(
        cfg, wave, taus["tautot"], paths, None, ktab.del_g
    )  # (NWAVE, NPATH) radiance

    if tanhe_shift is None:
        specmod = (
            spec[:, jnp.asarray(geo["lo"])] * jnp.asarray(geo["wlo"])[None, :]
            + spec[:, jnp.asarray(geo["hi"])] * jnp.asarray(geo["whi"])[None, :]
        )  # (NWAVE, NGEOM)
    else:
        bt = jnp.asarray(geo["baseh_tan"])  # (NPATH,) km, ascending
        th = jnp.asarray(geo["tanhe_km"]) + tanhe_shift  # (NGEOM,)
        idx = jnp.clip(jnp.searchsorted(bt, th) - 1, 0, bt.shape[0] - 2)
        w = (th - bt[idx]) / (bt[idx + 1] - bt[idx])
        w = jnp.clip(w, 0.0, 1.0)
        specmod = spec[:, idx] * (1.0 - w)[None, :] + spec[:, idx + 1] * w[None, :]
    if return_diagnostics:
        return specmod, {"layers": layers, "paths": paths, **taus,
                         "spec_paths": spec}
    return specmod


def forward_so_aotf(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab_orders,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    cfg_orders,
    geo: dict,
    conv_orders,
    trans_aotf,
):
    """AOTF multi-diffraction-order solar occultation (reference nemesisSOfm
    AOTF branch, ForwardModel_0.py:825-907).

    Instruments with an acousto-optic tunable filter see several diffraction
    orders at once; the reconstructed spectrum is the TRANS_AOTF-weighted
    sum of per-order forward models, normalised by the summed weights
    (:901-907).

    Parameters
    ----------
    ktab_orders / cfg_orders : per-order windowed KTables + ForwardConfig
        (the reference re-reads tables per order, :835-842)
    conv_orders : per-order callables ``(wave, specmod) -> (NCONV, NGEOM)``
        applying that order's ILS onto its shifted channel grid
    trans_aotf : (NCONV, NGEOM, NORDERS) AOTF order transmissions

    The tangent-path geometry ``geo`` is spectral-range independent and
    shared across orders. The order loop is a static Python loop — each
    order has its own wave window, so XLA compiles one fused program over
    all orders.

    Divergence from the reference: its AOTF loop re-applies subprofretg to
    the same mutable AtmosphereX every order iteration, compounding
    in-place profile scalings across orders (ForwardModel_0.py:835 resets
    only SpectroscopyX; model_2.py:133 multiplies in place). Here one
    frozen atmosphere state feeds every order.
    """
    trans_aotf = jnp.asarray(trans_aotf)
    combined = 0.0
    for o, (kt, cfg_o, conv) in enumerate(
        zip(ktab_orders, cfg_orders, conv_orders)
    ):
        specmod = forward_so(atm, laycfg, kt, cia, aero, cfg_o, geo)
        combined = combined + conv(kt.wave, specmod) * trans_aotf[:, :, o]
    return combined / jnp.sum(trans_aotf, axis=2)


def forward_transit(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    cfg: ForwardConfig,
    stellar_radius_km,
    return_diagnostics: bool = False,
):
    """Primary-transit depth spectrum (reference nemesisPTfm
    ForwardModel_0.py:1838 + calc_path_PT :3697).

    Limb transmission paths through every layer base (LAYANG=90), computed
    in ONE batched opacity evaluation; the effective absorbing area is the
    trapezoid integral of (1 - T) * 2*pi*(R + h) over tangent height, and
    the transit depth is 100 * (A_abs + A_disk) / A_star.
    """
    from archnemesis_tpu.rt.path import limb_paths

    layers = apply_dust_renorm(build_layers(atm, laycfg, layang=90.0), atm)
    nlay = laycfg.nlay
    paths = limb_paths(
        layers, atm.radius, atm.h[-1], list(range(nlay - 1)),
        imod=PathCalc.PLANCK_FUNCTION_AT_BIN_CENTRE,
    )
    wave = ktab.wave
    taus = layer_optical_depths(cfg, layers, wave, ktab, cia, aero)
    trans = path_spectrum(
        cfg, wave, taus["tautot"], paths, None, ktab.del_g
    )  # (NWAVE, NLAY-1) transmission per tangent layer base

    baseh = layers.baseh[: nlay - 1]
    ann = (1.0 - trans) * (2.0 * np.pi) * (baseh + atm.radius)[None, :]
    dh = baseh[1:] - baseh[:-1]
    area_abs = 0.5 * jnp.sum((ann[:, :-1] + ann[:, 1:]) * dh[None, :], axis=1)
    area_disk = np.pi * (atm.radius + baseh[0]) ** 2
    area_star = np.pi * (stellar_radius_km * 1.0e3) ** 2
    depth = (area_abs + area_disk) / area_star * 100.0
    if return_diagnostics:
        return depth, {"layers": layers, "paths": paths, **taus,
                       "trans": trans}
    return depth


def forward_disc(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    surf: Optional[SurfaceSpec],
    cfg: ForwardConfig,
    quad: dict,
    point_fn=None,
):
    """Disc-averaged spectrum over a static quadrature (rt.disc.
    disc_quadrature): the reference nemesisdiscfm's joblib fan-out over
    averaging rays (ForwardModel_0.py:1609) becomes ONE vmapped batch over
    the (emiss, sol, azi) angle axis — the layering and opacities do not
    depend on the mapped angles, so XLA hoists them out of the batch.
    """
    if point_fn is None:
        def point_fn(e, s, a):
            return forward_nadir(
                atm, laycfg, ktab, cia, aero, surf, cfg,
                emiss_ang=e, sol_ang=s, azi_ang=a,
            )[:, 0]

    specs = jax.vmap(point_fn)(
        jnp.asarray(quad["emiss_ang"]),
        jnp.asarray(quad["sol_ang"]),
        jnp.asarray(quad["azi_ang"]),
    )  # (NAV, NWAVE)
    return jnp.einsum("i,iw->w", jnp.asarray(quad["wgeom"]), specs)


def solar_flux(stellar: Optional[StellarSpec], wave):
    """Stellar flux at the planet distance interpolated to the calc grid
    (reference Stellar_0.calc_solar_flux:429 + ForwardModel_0.py:4353-4358).
    """
    if stellar is None or not stellar.solexist:
        return jnp.zeros_like(wave)
    au_cm = 1.49598e11 * 100.0
    area = 4.0 * np.pi * (stellar.dist * au_cm) ** 2
    return jnp.interp(wave, jnp.asarray(stellar.wave),
                      jnp.asarray(stellar.solspec) / area)


def forward_scattering_nadir(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    surf: Optional[SurfaceSpec],
    stellar: Optional[StellarSpec],
    cfg: ForwardConfig,
    quad,                # rt.scattering.ScatterQuadrature
    hgphase,             # (wave, f, g1, g2) per-mode HG params
    emiss_ang, sol_ang, azi_ang,
    iray_phase: bool,
    return_diagnostics: bool = False,
):
    """Nadir multiple-scattering forward evaluation (reference
    calculate_multiple_scattering_spectrum ForwardModel_0.py:4343 +
    scloud11wave wrapper :5018): vertical layer opacities feed the
    adding-doubling core directly (no LOS scaling).
    """
    from archnemesis_tpu.ops.planck import planck
    from archnemesis_tpu.rt.scattering import (
        brdf_fourier_matrix,
        henyey_greenstein2,
        scloud11wave_tiled,
    )
    from archnemesis_tpu.rt.surface import surface_brdf_fn

    layers = apply_dust_renorm(build_layers(atm, laycfg, layang=0.0), atm)
    wave = ktab.wave
    taus = layer_optical_depths(cfg, layers, wave, ktab, cia, aero)

    bnu = planck(wave[:, None], layers.temp[None, :], ispace=int(cfg.ispace))
    nmu = quad.nmu
    if surf is not None and not cfg.gasgiant and surf.tsurf > 0.0:
        emiss = interp1d_extrap(surf.vem, surf.emissivity, wave)
        radg = (planck(wave, surf.tsurf, ispace=int(cfg.ispace)) * emiss)[
            :, None
        ] * jnp.ones((1, nmu))
    else:
        radg = bnu[:, 0:1] * jnp.ones((1, nmu))
    # reflective lower boundary: BRDF Fourier matrix enters the doubling
    # ladder as the bottom layer (reference scloud11wave:5099-5103
    # calc_brdf_matrix for LOWBC != THERMAL; Lambert AND Hapke/Oren-Nayar)
    brdf_matrix = None
    if surf is not None and not cfg.gasgiant and int(surf.lowbc) != 0:
        brdf_matrix = brdf_fourier_matrix(
            surface_brdf_fn(surf, wave), quad, wave.shape[0]
        )

    sol = solar_flux(stellar, wave)

    hg_wave, hg_f, hg_g1, hg_g2 = hgphase
    phase_fns = []
    for j in range(hg_f.shape[1]):
        f = jnp.interp(wave, jnp.asarray(hg_wave), jnp.asarray(hg_f[:, j]))
        g1 = jnp.interp(wave, jnp.asarray(hg_wave), jnp.asarray(hg_g1[:, j]))
        g2 = jnp.interp(wave, jnp.asarray(hg_wave), jnp.asarray(hg_g2[:, j]))
        phase_fns.append(
            lambda c, f=f, g1=g1, g2=g2: henyey_greenstein2(
                c[None], f[:, None, None, None], g1[:, None, None, None],
                g2[:, None, None, None],
            )
        )

    # per-mode scattering fraction (reference wrapper FRAC :5109-5118)
    tauscat = taus["tauscat"]
    tauclscat = taus["tauclscat"]  # (NWAVE, NLAY, NDUST)
    safe = jnp.where(tauscat > 0.0, tauscat, 1.0)
    lfrac = jnp.where(
        (tauscat > 0.0)[:, :, None], tauclscat / safe[:, :, None], 0.0
    )
    lfrac = jnp.transpose(lfrac, (0, 2, 1))  # (NWAVE, NCONT, NLAY)

    rad = scloud11wave_tiled(
        quad, phase_fns,
        radg=radg,
        brdf_matrix=brdf_matrix,
        sol_ang=jnp.atleast_1d(jnp.asarray(sol_ang, dtype=wave.dtype)),
        emiss_ang=jnp.atleast_1d(jnp.asarray(emiss_ang, dtype=wave.dtype)),
        azi_ang=jnp.atleast_1d(jnp.asarray(azi_ang, dtype=wave.dtype)),
        solar=sol,
        bnu=bnu,
        taus=taus["tautot"],
        tauray=taus["tauray"],
        tauscat=tauscat,
        lfrac=lfrac,
        iray=iray_phase,
        wave_tile=cfg.scat_wave_tile,
    )  # (NWAVE, NG, NPATH)
    spec = jnp.einsum("wgp,g->wp", rad, jnp.asarray(ktab.del_g))
    if return_diagnostics:
        return spec, {"layers": layers, **taus, "rad_g": rad}
    return spec


def forward_singlescat_nadir(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    surf: Optional[SurfaceSpec],
    stellar: Optional[StellarSpec],
    cfg: ForwardConfig,
    hgphase,            # (wave, f, g1, g2) per-mode HG params
    emiss_ang, sol_ang, azi_ang,
    iray_phase: bool,
    return_diagnostics: bool = False,
):
    """Nadir single-scattering forward evaluation (reference
    calculate_single_scattering_plane_parallel_spectrum
    ForwardModel_0.py:4251; the path angle is reset to 0 for scattering
    calculations, calc_path :2972-2975, so LOS taus equal vertical taus
    ordered top->bottom)."""
    from archnemesis_tpu.ops.planck import planck  # noqa: F401
    from archnemesis_tpu.rt.singlescat import (
        layer_mean_phase,
        scattering_cos_angle,
        single_scatter_plane_spectrum,
    )
    from archnemesis_tpu.rt.surface import hg_phase2

    layers = apply_dust_renorm(build_layers(atm, laycfg, layang=0.0), atm)
    wave = ktab.wave
    taus = layer_optical_depths(cfg, layers, wave, ktab, cia, aero)

    calpha = scattering_cos_angle(
        jnp.asarray(sol_ang, dtype=wave.dtype),
        jnp.asarray(emiss_ang, dtype=wave.dtype),
        jnp.asarray(azi_ang, dtype=wave.dtype),
    )
    theta = jnp.rad2deg(jnp.arccos(jnp.clip(calpha, -1.0, 1.0)))

    hg_wave, hg_f, hg_g1, hg_g2 = hgphase
    pm = []
    for j in range(hg_f.shape[1]):
        f = jnp.interp(wave, jnp.asarray(hg_wave), jnp.asarray(hg_f[:, j]))
        g1 = jnp.interp(wave, jnp.asarray(hg_wave), jnp.asarray(hg_g1[:, j]))
        g2 = jnp.interp(wave, jnp.asarray(hg_wave), jnp.asarray(hg_g2[:, j]))
        pm.append(hg_phase2(theta, g1, g2, f) / (4.0 * np.pi))
    phase_modes = (
        jnp.stack(pm, axis=1) if pm
        else jnp.zeros((wave.shape[0], 0), wave.dtype)
    )
    phase_ray = (
        0.75 * (1.0 + calpha**2) / (4.0 * np.pi) * jnp.ones_like(wave)
        if iray_phase
        else jnp.zeros_like(wave)
    )

    phase_lay = layer_mean_phase(
        phase_modes, phase_ray, taus["tauclscat"], taus["tauray"],
        taus["tauscat"],
    )  # (NWAVE, NLAY)

    safe_tau = jnp.where(taus["tautot"] > 0.0, taus["tautot"], 1.0)
    omega = jnp.where(
        taus["tautot"] > 0.0,
        (taus["tauray"] + taus["tauscat"])[:, None, :] / safe_tau,
        0.0,
    )  # (NWAVE, NG, NLAY)

    sol = solar_flux(stellar, wave)

    if surf is not None and not cfg.gasgiant and surf.tsurf > 0.0:
        emissivity = interp1d_extrap(surf.vem, surf.emissivity, wave)
        tsurf = surf.tsurf
    else:
        emissivity = jnp.zeros_like(wave)
        tsurf = jnp.asarray(-1.0, dtype=wave.dtype)

    sol_a = jnp.atleast_1d(jnp.asarray(sol_ang, dtype=wave.dtype))
    emi_a = jnp.atleast_1d(jnp.asarray(emiss_ang, dtype=wave.dtype))
    azi_a = jnp.atleast_1d(jnp.asarray(azi_ang, dtype=wave.dtype))
    if surf is not None and not cfg.gasgiant and int(surf.lowbc) != 0:
        # reference calc_BRDF at the single path geometry (Lambert/Hapke/
        # Oren-Nayar dispatch, Surface_0.py:916)
        from archnemesis_tpu.rt.surface import surface_brdf_fn

        brdf = surface_brdf_fn(surf, wave)(sol_a, emi_a, azi_a)[:, 0]
    else:
        brdf = jnp.zeros_like(wave)

    # path: vertical taus top->bottom (angle reset to 0)
    nlay = layers.nlay
    order = jnp.arange(nlay - 1, -1, -1)
    tau_path = taus["tautot"][:, :, order]
    emtemp = layers.temp[order]
    spec = single_scatter_plane_spectrum(
        wave, tau_path, emtemp,
        omega[:, :, order], phase_lay[:, order],
        jnp.ones(nlay, dtype=wave.dtype),
        tsurf, emissivity, brdf, sol,
        sol_a[0], emi_a[0], ispace=int(cfg.ispace),
    )  # (NWAVE, NG)
    out = jnp.einsum("wg,g->w", spec, jnp.asarray(ktab.del_g))[:, None]
    if return_diagnostics:
        return out, {"layers": layers, **taus, "phase_lay": phase_lay}
    return out


def forward_nadir(
    atm: Atmosphere,
    laycfg: LayerConfig,
    ktab: KTables,
    cia: Optional[CIATables],
    aero: Optional[AerosolOptics],
    surf: Optional[SurfaceSpec],
    cfg: ForwardConfig,
    emiss_ang,
    sol_ang=180.0,
    azi_ang=0.0,
    emis=None,
    emis_gas_cols=(),
    emis_dist=None,
    return_diagnostics: bool = False,
):
    """One nadir-geometry forward evaluation on the k-table wave grid.

    Equivalent to the reference nemesisfm inner loop for a single (IGEOM,
    IAV) with thermal emission (ForwardModel_0.py:437 + CIRSrad).

    ``emis``/``emis_gas_cols``/``emis_dist``: optional non-LTE emission
    tables (core.emissions.EmissionTables), their static atmosphere-column
    mapping (ops.emissions.locate_emission_gases) and the planet-star
    distance in AU (None without a stellar spectrum).
    """
    layers = apply_dust_renorm(build_layers(atm, laycfg, layang=0.0), atm)
    path = nadir_path(
        layers,
        atm.radius,
        atm.h[-1],
        emiss_ang,
        sol_ang=sol_ang,
        azi_ang=azi_ang,
        imod=PathCalc.THERMAL_EMISSION,
    )
    wave = ktab.wave
    taus = layer_optical_depths(cfg, layers, wave, ktab, cia, aero)
    emission_layer = None
    if emis is not None:
        from archnemesis_tpu.ops.emissions import layer_emission

        emission_layer = layer_emission(
            emis, wave, layers.temp, layers.amount, emis_gas_cols,
            dist=emis_dist,
        )
    spec = path_spectrum(
        cfg, wave, taus["tautot"], path, surf, ktab.del_g,
        emission_layer=emission_layer,
    )
    if return_diagnostics:
        return spec, {"layers": layers, "path": path, **taus}
    return spec
