"""Single-file HDF5 run format loader (the reference's ``runname.h5``
layout, one group per component: Files.read_input_files_hdf5 Files.py:114
and the per-class read_hdf5 methods, e.g. Atmosphere_0.py:490).

Units in the HDF5 format are SI already (H in m, P in Pa), unlike the
legacy text decks.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from archnemesis_tpu.core.spectra import AerosolOptics, KTables, SurfaceSpec
from archnemesis_tpu.core.types import Atmosphere, LayerConfig
from archnemesis_tpu.enums import (
    AtmosphericProfileFormat,
    LowerBoundaryCondition,
    ParaH2Ratio,
    SpectraUnit,
    SpectralCalculationMode,
    WaveUnit,
)
from archnemesis_tpu.io.ktables import read_kta, read_lta
from archnemesis_tpu.io.legacy import Deck, Geometry, RunSettings
from archnemesis_tpu.rt.atmosphere import calc_grav, calc_molwt, gas_molwt_per_column


def _scalar(f, name, cast=int, default=None):
    if name not in f:
        return default
    return cast(np.asarray(f[name][()]).item())


def _read_atmosphere_group(a) -> Atmosphere:
    """One Atmosphere group (reference Atmosphere_0.read_hdf5:490) —
    shared by the main deck and the nested Telluric/Atmosphere."""
    h = a["H"][()].astype(float)
    p = a["P"][()].astype(float)
    t = a["T"][()].astype(float)
    vmr = a["VMR"][()].astype(float)
    dust = (
        a["DUST"][()].astype(float)
        if "DUST" in a
        else np.zeros((h.shape[0], 0))
    )
    gas_id = tuple(int(x) for x in a["ID"][()])
    iso_id = tuple(int(x) for x in a["ISO"][()])
    amform = AtmosphericProfileFormat(_scalar(a, "AMFORM", default=1))
    planet = _scalar(a, "IPLANET")
    lat = _scalar(a, "LATITUDE", float, 0.0)

    if "MOLWT" in a:
        # AMFORM=0 carries an explicit molwt profile (reference
        # Atmosphere_0.write_hdf5 stores it; legacy .ref column 4)
        molwt = a["MOLWT"][()].astype(float)
    else:
        masses = gas_molwt_per_column(gas_id, iso_id)
        molwt = np.asarray(calc_molwt(vmr, masses))
    grav, radius = calc_grav(h, lat, planet)
    return Atmosphere(
        h=h, p=p, t=t, vmr=vmr, dust=dust,
        parah2=np.zeros_like(h), molwt=molwt,
        radius=np.asarray(radius), latitude=np.asarray(float(lat)),
        gas_id=gas_id, iso_id=iso_id, planet=planet, amform=amform,
    )


def _read_tables(sp, base_dir):
    """Spectroscopy group -> KTables/LBL tables (path-resolved)."""
    ilbl = SpectralCalculationMode(_scalar(sp, "ILBL"))
    locations = [
        x.decode() if isinstance(x, bytes) else str(x)
        for x in sp["LOCATION"][()]
    ]
    from archnemesis_tpu.utils.path_redirect import resolve_path

    tables = []
    for loc in locations:
        tp = resolve_path(loc, base_dir)
        if ilbl == SpectralCalculationMode.LINE_BY_LINE_TABLES:
            tables.append(read_lta(tp))
        else:
            tables.append(read_kta(tp))
    return (
        KTables.from_tables(tables, ilbl=ilbl) if tables else None,
        ilbl,
    )


def load_deck_hdf5(path: str) -> Deck:
    """Load a ``runname.h5`` run into framework pytrees."""
    import h5py

    base_dir = os.path.dirname(os.path.abspath(path))

    with h5py.File(path, "r") as f:
        # --- Atmosphere (reference Atmosphere_0.read_hdf5:490)
        atm = _read_atmosphere_group(f["Atmosphere"])

        # --- Layer
        ly = f["Layer"]
        laycfg = LayerConfig(
            nlay=_scalar(ly, "NLAY"),
            laytyp=_scalar(ly, "LAYTYP"),
            layint=_scalar(ly, "LAYINT"),
            layht=_scalar(ly, "LAYHT", float, 0.0),
            h_base=ly["H_base"][()].astype(float) if "H_base" in ly else None,
            p_base=ly["P_base"][()].astype(float) if "P_base" in ly else None,
        )

        # --- Measurement (reference Measurement_0.read_hdf5:475)
        m = f["Measurement"]
        ngeom = _scalar(m, "NGEOM")
        nconv = m["NCONV"][()].astype(int)
        nav = m["NAV"][()].astype(int)
        vconv = m["VCONV"][()].astype(float)
        meas = m["MEAS"][()].astype(float)
        errmeas = m["ERRMEAS"][()].astype(float)
        emiss = m["EMISS_ANG"][()].astype(float)
        woff = _scalar(m, "WOFF", float, 0.0)
        tanhe = m["TANHE"][()].astype(float) if "TANHE" in m else None
        zeros = np.zeros_like(emiss)
        geom = Geometry(
            fwhm=_scalar(m, "FWHM", float, 0.0),
            latitude=_scalar(m, "LATITUDE", float, 0.0),
            longitude=_scalar(m, "LONGITUDE", float, 0.0),
            ngeom=ngeom, nconv=nconv, nav=nav,
            vconv=vconv + woff, meas=meas, errmeas=errmeas,
            flat=m["FLAT"][()].astype(float) if "FLAT" in m else zeros,
            flon=m["FLON"][()].astype(float) if "FLON" in m else zeros,
            sol_ang=m["SOL_ANG"][()].astype(float) if "SOL_ANG" in m else zeros,
            emiss_ang=emiss,
            azi_ang=m["AZI_ANG"][()].astype(float) if "AZI_ANG" in m else zeros,
            wgeom=m["WGEOM"][()].astype(float) if "WGEOM" in m else zeros + 1,
            tanhe=tanhe,
            woff=woff,
        )
        ishape = _scalar(m, "ISHAPE", default=0)
        ispace = _scalar(m, "ISPACE", default=0)
        iform = _scalar(m, "IFORM", default=0)
        v_doppler = _scalar(m, "V_DOPPLER", float, 0.0)
        vnorm = _scalar(m, "VNORM", float, None)  # IFORM=5 (Measurement_0.py:563)

        # --- Spectroscopy
        ktab, ilbl = _read_tables(f["Spectroscopy"], base_dir)
        table_locations = tuple(
            x.decode() if isinstance(x, bytes) else str(x)
            for x in f["Spectroscopy"]["LOCATION"][()]
        )

        # --- CIA (reference CIA_0.read_hdf5:250: a named table + INORMAL)
        cia = None
        cia_table = None
        if "CIA" in f:
            from archnemesis_tpu.data.datadir import data_path
            from archnemesis_tpu.io.cia import read_cia_h5, read_cia_tab

            cg = f["CIA"]
            name = cg["CIATABLE"][()]
            name = name.decode() if isinstance(name, bytes) else str(name)
            inormal_cia = ParaH2Ratio(_scalar(cg, "INORMAL", default=0))
            dnu = _scalar(cg, "DNU", float, 10.0)
            npara = _scalar(cg, "NPARA", default=0)
            tp = name if os.path.isabs(name) else data_path("cia", name)
            if not os.path.exists(tp):
                tp = os.path.join(base_dir, name)
            cia = (read_cia_h5(tp, inormal=inormal_cia) if tp.endswith(".h5")
                   else read_cia_tab(tp, dnu=dnu, npara=npara,
                                     inormal=inormal_cia))
            cia_table = (name, dnu, npara)

        # --- Telluric (reference Telluric_0.read_hdf5:141: /Telluric group
        # with a nested Atmosphere + Spectroscopy)
        telluric = None
        if "Telluric" in f:
            from archnemesis_tpu.rt.telluric import Telluric

            tg = f["Telluric"]
            tel_atm = _read_atmosphere_group(tg["Atmosphere"])
            tel_ktab, _ = _read_tables(tg["Spectroscopy"], base_dir)
            telluric = Telluric(
                atm=tel_atm,
                ktables=tel_ktab,
                altitude=_scalar(tg, "ALTITUDE", float, 0.0),
                emiss_ang=_scalar(tg, "EMISS_ANG", float, 180.0),
            )

        # --- Scatter / Surface / Retrieval
        sc = f["Scatter"] if "Scatter" in f else None
        iray = _scalar(sc, "IRAY", default=0) if sc is not None else 0
        imie = _scalar(sc, "IMIE", default=0) if sc is not None else 0
        iscat = _scalar(sc, "ISCAT", default=0) if sc is not None else 0
        nmu = _scalar(sc, "NMU", default=5) if sc is not None else 5
        nf = _scalar(sc, "NF", default=0) if sc is not None else 0
        nphi = _scalar(sc, "NPHI", default=100) if sc is not None else 100

        aero: Optional[AerosolOptics] = None
        if sc is not None and "KEXT" in sc and atm.ndust > 0:
            kext = sc["KEXT"][()].astype(float)
            sglalb = sc["SGLALB"][()].astype(float)
            aero = AerosolOptics(
                wave=sc["WAVE"][()].astype(float), kext=kext,
                ksca=sglalb * kext,
            )

        su = f["Surface"] if "Surface" in f else None
        tsurf = _scalar(su, "TSURF", float, 0.0) if su is not None else 0.0
        gasgiant = su is None or tsurf <= 0.0
        lowbc_su = LowerBoundaryCondition(
            _scalar(su, "LOWBC", default=0) if su is not None else 0
        )
        hapke = None
        on_albedo = on_roughness = None
        if su is not None and lowbc_su == LowerBoundaryCondition.HAPKE:
            # reference Surface_0.read_hdf5:535-545 (HAPKE parameter block)
            from archnemesis_tpu.core.spectra import HapkeParams

            hapke = HapkeParams(
                vem=su["VEM"][()].astype(float),
                sglalb=su["SGLALB"][()].astype(float),
                k=su["K"][()].astype(float),
                bs0=su["BS0"][()].astype(float),
                hs=su["hs"][()].astype(float),
                bc0=su["BC0"][()].astype(float),
                hc=su["hc"][()].astype(float),
                roughness=su["ROUGHNESS"][()].astype(float),
                g1=su["G1"][()].astype(float),
                g2=su["G2"][()].astype(float),
                f=su["F"][()].astype(float),
            )
        if su is not None and lowbc_su == LowerBoundaryCondition.OREN_NAYAR:
            on_albedo = su["ALBEDO"][()].astype(float)
            on_roughness = su["ROUGHNESS"][()].astype(float)
        surf = SurfaceSpec(
            tsurf=np.asarray(tsurf if not gasgiant else 0.0),
            vem=(su["VEM"][()].astype(float) if su is not None
                 else np.array([0.0, 1e6])),
            emissivity=(su["EMISSIVITY"][()].astype(float)
                        if su is not None else np.zeros(2)),
            galb=np.asarray(_scalar(su, "GALB", float, 0.0) if su is not None else 0.0),
            hapke=hapke,
            on_albedo=on_albedo,
            on_roughness=on_roughness,
            lowbc=lowbc_su,
            gasgiant=gasgiant,
        )

        rt = f["Retrieval"] if "Retrieval" in f else None
        niter = _scalar(rt, "NITER", default=0) if rt is not None else 0
        philimit = _scalar(rt, "PHILIMIT", float, 0.1) if rt is not None else 0.1

    # --- Stellar (reference Stellar_0.read_hdf5:290)
    from archnemesis_tpu.io.stellar import read_stellar_hdf5

    stellar = read_stellar_hdf5(path)

    settings = RunSettings(
        ispace=WaveUnit(ispace), iscat=iscat, ilbl=ilbl,
        iform=SpectraUnit(iform), woff=woff, niter=niter, philimit=philimit,
        inormal=ParaH2Ratio.EQUILIBRIUM, iray=iray, imie=imie,
        nmu=nmu, nf=nf, nphi=nphi,
        isol=stellar is not None,
        dist=float(np.asarray(stellar.dist)) if stellar is not None else 0.0,
        lowbc=surf.lowbc, galb=float(surf.galb), tsurf=tsurf,
        v_doppler=v_doppler, ishape=ishape, vnorm=vnorm,
    )
    return Deck(
        atmosphere=atm, layer_config=laycfg, geometry=geom,
        settings=settings, ktables=ktab, cia=cia, aerosol=aero,
        surface=surf, stellar=stellar, apr_path=None, telluric=telluric,
        table_locations=table_locations, cia_table=cia_table,
    )


def write_deck_hdf5(path: str, deck: Deck) -> None:
    """Write a Deck as a single ``runname.h5`` run file readable by
    ``load_deck_hdf5`` — the legacy->HDF5 conversion flow (reference
    Files.write_input_files_hdf5 via the per-class write_hdf5 methods,
    e.g. Atmosphere_0.write_hdf5:414, Measurement_0.write_hdf5:475).

    Spectral tables and CIA stay on disk as external files; the run file
    stores their locations (reference Spectroscopy/CIA groups do the same).
    """
    import h5py

    st = deck.settings
    atm = deck.atmosphere
    g = deck.geometry
    with h5py.File(path, "w") as f:
        a = f.create_group("Atmosphere")
        a["H"] = np.asarray(atm.h, dtype=np.float64)
        a["P"] = np.asarray(atm.p, dtype=np.float64)
        a["T"] = np.asarray(atm.t, dtype=np.float64)
        a["VMR"] = np.asarray(atm.vmr, dtype=np.float64)
        if atm.ndust > 0:
            a["DUST"] = np.asarray(atm.dust, dtype=np.float64)
        a["ID"] = np.asarray(atm.gas_id, dtype=np.int32)
        a["ISO"] = np.asarray(atm.iso_id, dtype=np.int32)
        a["AMFORM"] = int(atm.amform)
        if int(atm.amform) == 0:
            a["MOLWT"] = np.asarray(atm.molwt, dtype=np.float64)
        a["IPLANET"] = int(atm.planet)
        a["LATITUDE"] = float(np.asarray(atm.latitude))

        ly = f.create_group("Layer")
        ly["NLAY"] = int(deck.layer_config.nlay)
        ly["LAYTYP"] = int(deck.layer_config.laytyp)
        ly["LAYINT"] = int(deck.layer_config.layint)
        ly["LAYHT"] = float(deck.layer_config.layht)
        if deck.layer_config.h_base is not None:
            ly["H_base"] = np.asarray(deck.layer_config.h_base, np.float64)
        if deck.layer_config.p_base is not None:
            ly["P_base"] = np.asarray(deck.layer_config.p_base, np.float64)

        m = f.create_group("Measurement")
        m["NGEOM"] = int(g.ngeom)
        m["NCONV"] = np.asarray(g.nconv, dtype=np.int32)
        m["NAV"] = np.asarray(g.nav, dtype=np.int32)
        # VCONV already carries any .spx offset; write WOFF=0 so a
        # round-trip does not re-apply it
        m["WOFF"] = 0.0
        m["VCONV"] = np.asarray(g.vconv, dtype=np.float64)
        m["MEAS"] = np.asarray(g.meas, dtype=np.float64)
        m["ERRMEAS"] = np.asarray(g.errmeas, dtype=np.float64)
        m["FLAT"] = np.asarray(g.flat, dtype=np.float64)
        m["FLON"] = np.asarray(g.flon, dtype=np.float64)
        m["SOL_ANG"] = np.asarray(g.sol_ang, dtype=np.float64)
        m["EMISS_ANG"] = np.asarray(g.emiss_ang, dtype=np.float64)
        m["AZI_ANG"] = np.asarray(g.azi_ang, dtype=np.float64)
        m["WGEOM"] = np.asarray(g.wgeom, dtype=np.float64)
        if g.tanhe is not None:
            m["TANHE"] = np.asarray(g.tanhe, dtype=np.float64)
        m["FWHM"] = float(g.fwhm)
        m["LATITUDE"] = float(g.latitude)
        m["LONGITUDE"] = float(g.longitude)
        m["ISHAPE"] = int(st.ishape)
        m["ISPACE"] = int(st.ispace)
        m["IFORM"] = int(st.iform)
        m["V_DOPPLER"] = float(st.v_doppler)
        if st.vnorm is not None:
            m["VNORM"] = float(st.vnorm)

        sp = f.create_group("Spectroscopy")
        sp["ILBL"] = int(st.ilbl)
        locs = deck.table_locations or ()
        sp["LOCATION"] = np.asarray([s.encode() for s in locs])

        if deck.cia_table is not None:
            cg = f.create_group("CIA")
            name, dnu, npara = deck.cia_table
            cg["CIATABLE"] = name.encode()
            cg["DNU"] = float(dnu)
            cg["NPARA"] = int(npara)
            cg["INORMAL"] = int(st.inormal)

        sc = f.create_group("Scatter")
        sc["IRAY"] = int(st.iray)
        sc["IMIE"] = int(st.imie)
        sc["ISCAT"] = int(st.iscat)
        sc["NMU"] = int(st.nmu)
        sc["NF"] = int(st.nf)
        sc["NPHI"] = int(st.nphi)
        if deck.aerosol is not None:
            sc["WAVE"] = np.asarray(deck.aerosol.wave, dtype=np.float64)
            kext = np.asarray(deck.aerosol.kext, dtype=np.float64)
            ksca = np.asarray(deck.aerosol.ksca, dtype=np.float64)
            sc["KEXT"] = kext
            with np.errstate(invalid="ignore", divide="ignore"):
                sc["SGLALB"] = np.where(kext > 0, ksca / kext, 0.0)

        if deck.surface is not None:
            su = f.create_group("Surface")
            su["TSURF"] = float(np.asarray(deck.surface.tsurf))
            su["VEM"] = np.asarray(deck.surface.vem, dtype=np.float64)
            su["EMISSIVITY"] = np.asarray(deck.surface.emissivity,
                                          dtype=np.float64)
            su["GALB"] = float(np.asarray(deck.surface.galb))
            su["LOWBC"] = int(deck.surface.lowbc)

        rt = f.create_group("Retrieval")
        rt["NITER"] = int(st.niter)
        rt["PHILIMIT"] = float(st.philimit)

    if deck.stellar is not None:
        from archnemesis_tpu.io.stellar import write_stellar_hdf5

        write_stellar_hdf5(path, deck.stellar)
