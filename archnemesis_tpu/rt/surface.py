"""Surface reflectance models: Lambert, Hapke (2012), Oren-Nayar (1994).

Vectorised jnp re-expressions of the reference ``Surface_0`` BRDF machinery
(Surface_0.py: calc_BRDF:916, calc_Hapke_BRDFx:1334, calc_OrenNayar_BRDFx:
1777, E/nu/H helpers :1633-1735): the per-(wave, angle) scalar kernels
become broadcasting expressions over (..., NWAVE) x (NTHETA,) with
``jnp.where`` for the angle-ordering branches, so they batch over paths and
differentiate for surface-parameter retrievals (models 999/887 etc.).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hg_phase2(theta_deg, g1, g2, f):
    """Double Henyey-Greenstein phase function, 4pi-normalised (reference
    calc_Hapke_hgphase Surface_0.py:1715 / Scatter calc_hgphase without the
    1/4pi)."""
    c = jnp.cos(jnp.deg2rad(theta_deg))
    t1 = (1.0 - g1**2) / (1.0 - 2.0 * g1 * c + g1**2) ** 1.5
    t2 = (1.0 - g2**2) / (1.0 - 2.0 * g2 * c + g2**2) ** 1.5
    return f * t1 + (1.0 - f) * t2


def lambert_brdf(albedo, ntheta: int):
    """(NWAVE,) albedo -> (NWAVE, NTHETA) BRDF = A/pi (reference
    calc_BRDF Lambertian branch :941-948)."""
    a = jnp.asarray(albedo)
    return jnp.broadcast_to(a[:, None] / np.pi, (a.shape[0], ntheta))


def _hapke_e1(x_deg, theta_bar_deg):
    tb = jnp.deg2rad(theta_bar_deg)
    x = jnp.deg2rad(x_deg)
    val = jnp.exp(
        -2.0 / np.pi / jnp.tan(tb) / jnp.tan(jnp.where(x == 0.0, 1.0, x))
    )
    return jnp.where((theta_bar_deg == 0.0) | (x_deg == 0.0), 0.0, val)


def _hapke_e2(x_deg, theta_bar_deg):
    tb = jnp.deg2rad(theta_bar_deg)
    x = jnp.deg2rad(x_deg)
    val = jnp.exp(
        -1.0 / np.pi / jnp.tan(tb) ** 2
        / jnp.tan(jnp.where(x == 0.0, 1.0, x)) ** 2
    )
    return jnp.where((theta_bar_deg == 0.0) | (x_deg == 0.0), 0.0, val)


def _hapke_h(w, x, r0):
    """Ambartsumian-Chandrasekhar H function (Surface_0.py:1449)."""
    return 1.0 / (
        1.0 - w * x * (r0 + (1.0 - 2.0 * r0 * x) / 2.0 * jnp.log((1.0 + x) / x))
    )


def hapke_brdf(w, k, bs0, hs, bc0, hc, roughness, g1, g2, f,
               sol_ang, emiss_ang, azi_ang):
    """Hapke (2012, ch. 12.3.1) BRDF (reference calc_Hapke_BRDFx
    Surface_0.py:1334-1445).

    Spectral params: (NWAVE,); angles (deg): (NTHETA,). Returns
    (NWAVE, NTHETA). NEMESIS azimuth convention (phi=0 forward scattering)
    is converted internally.
    """
    w = jnp.asarray(w)[:, None]
    k = jnp.asarray(k)[:, None]
    bs0 = jnp.asarray(bs0)[:, None]
    hs = jnp.asarray(hs)[:, None]
    bc0 = jnp.asarray(bc0)[:, None]
    hc = jnp.asarray(hc)[:, None]
    roughness = jnp.asarray(roughness)[:, None]
    g1 = jnp.asarray(g1)[:, None]
    g2 = jnp.asarray(g2)[:, None]
    f = jnp.asarray(f)[:, None]

    i = jnp.asarray(sol_ang)[None, :]
    e = jnp.asarray(emiss_ang)[None, :]
    phi = 180.0 - jnp.asarray(azi_ang)[None, :]
    phix = jnp.where(phi > 180.0, 360.0 - phi, jnp.abs(phi))

    mu = jnp.cos(jnp.deg2rad(e))
    mu0 = jnp.cos(jnp.deg2rad(i))
    cg = jnp.clip(
        mu * mu0
        + jnp.sqrt(1.0 - mu**2) * jnp.sqrt(1.0 - mu0**2)
        * jnp.cos(jnp.deg2rad(phix)),
        0.0, 1.0,
    )
    g = jnp.rad2deg(jnp.arccos(cg))

    gamma = jnp.sqrt(1.0 - w)
    r0 = (1.0 - gamma) / (1.0 + gamma)
    theta_bar = roughness * (1.0 - r0)
    chi = 1.0 / jnp.sqrt(1.0 + np.pi * jnp.tan(jnp.deg2rad(theta_bar)) ** 2)
    fphi = jnp.where(
        jnp.abs(phix) == 180.0,
        0.0,
        jnp.exp(-2.0 * jnp.abs(jnp.tan(jnp.deg2rad(phix) / 2.0))),
    )

    e1e = _hapke_e1(e, theta_bar)
    e2e = _hapke_e2(e, theta_bar)
    e1i = _hapke_e1(i, theta_bar)
    e2i = _hapke_e2(i, theta_bar)

    tbrad = jnp.deg2rad(theta_bar)
    xr_e = jnp.deg2rad(e)
    xr_i = jnp.deg2rad(i)
    phirad = jnp.deg2rad(phix)

    nue = chi * (
        jnp.cos(xr_e)
        + jnp.sin(xr_e) * jnp.tan(tbrad) * e2e / (2.0 - e1e)
    )
    nui = chi * (
        jnp.cos(xr_i)
        + jnp.sin(xr_i) * jnp.tan(tbrad) * e2i / (2.0 - e1i)
    )

    s2 = jnp.sin(phirad / 2.0) ** 2
    # i <= e branch
    den_le = 2.0 - e1e - phirad / np.pi * e1i
    mu0eff_le = chi * (
        jnp.cos(xr_i) + jnp.sin(xr_i) * jnp.tan(tbrad)
        * (jnp.cos(phirad) * e2e + s2 * e2i) / den_le
    )
    mueff_le = chi * (
        jnp.cos(xr_e) + jnp.sin(xr_e) * jnp.tan(tbrad)
        * (e2e - s2 * e2i) / den_le
    )
    # i > e branch
    den_gt = 2.0 - e1i - phirad / np.pi * e1e
    mu0eff_gt = chi * (
        jnp.cos(xr_i) + jnp.sin(xr_i) * jnp.tan(tbrad)
        * (e2i - s2 * e2e) / den_gt
    )
    mueff_gt = chi * (
        jnp.cos(xr_e) + jnp.sin(xr_e) * jnp.tan(tbrad)
        * (jnp.cos(phirad) * e2i + s2 * e2e) / den_gt
    )
    le = i <= e
    mu0eff = jnp.where(le, mu0eff_le, mu0eff_gt)
    mueff = jnp.where(le, mueff_le, mueff_gt)

    s_le = mueff / nue * mu0 / nui * chi / (1.0 - fphi + fphi * chi * mu0 / nui)
    s_gt = mueff / nue * mu0 / nui * chi / (1.0 - fphi + fphi * chi * mu / nue)
    s = jnp.where(le, s_le, s_gt)

    tg2 = jnp.tan(jnp.deg2rad(g) / 2.0)
    bs = bs0 / (1.0 + (1.0 / hs) * tg2)
    bc = bc0 / (1.0 + (1.3 + k) * (tg2 / hc + (tg2 / hc) ** 2))

    h0e = _hapke_h(w, mu0eff / k, r0)
    he = _hapke_h(w, mueff / k, r0)

    phase = hg_phase2(g, g1, g2, f)

    r = (
        k * w / (4.0 * np.pi) * mu0eff / (mu0eff + mueff)
        * (phase * (1.0 + bs) + (h0e * he - 1.0)) * (1.0 + bc) * s
    )
    brdf = r / mu0
    return jnp.where((e >= 90.0) | (i >= 90.0), 0.0, brdf)


def oren_nayar_brdf(albedo, roughness, sol_ang, emiss_ang, azi_ang):
    """Oren & Nayar (1994) rough-Lambert BRDF (reference
    calc_OrenNayar_BRDFx Surface_0.py:1777-1824). (NWAVE,)x(NTHETA,) ->
    (NWAVE, NTHETA)."""
    a = jnp.asarray(albedo)[:, None]
    sigma = jnp.deg2rad(jnp.asarray(roughness))[:, None]
    irad = jnp.deg2rad(jnp.asarray(sol_ang))[None, :]
    erad = jnp.deg2rad(jnp.asarray(emiss_ang))[None, :]
    phirad = jnp.deg2rad(jnp.asarray(azi_ang))[None, :]

    alpha = jnp.maximum(irad, erad)
    beta = jnp.minimum(irad, erad)
    cphi = jnp.cos(phirad)

    c1 = 1.0 - 0.5 * sigma**2 / (sigma**2 + 0.33)
    c2 = 0.45 * sigma**2 / (sigma**2 + 0.09)
    c2 = c2 * jnp.where(
        cphi >= 0, jnp.sin(alpha), jnp.sin(alpha) - (2.0 * beta / np.pi) ** 3
    )
    c3 = (
        0.125 * sigma**2 / (sigma**2 + 0.09)
        * (4.0 * alpha * beta / np.pi**2) ** 2
    )
    brdf1 = a / np.pi * (
        c1
        + cphi * c2 * jnp.tan(beta)
        + (1.0 - jnp.abs(cphi)) * c3 * jnp.tan((alpha + beta) / 2.0)
    )
    brdf2 = (
        0.17 * a**2 / np.pi * sigma**2 / (sigma**2 + 0.13)
        * (1.0 - cphi * (2.0 * beta / np.pi) ** 2)
    )
    return brdf1 + brdf2


def surface_brdf_fn(surf, wave):
    """Closure ``fn(sol_ang, emiss_ang, azi_ang) -> (NWAVE, NTHETA)`` for a
    SurfaceSpec at the calc wave grid — the reference Surface_0.calc_BRDF
    dispatch (Surface_0.py:916: Lambert :941, Hapke :949, Oren–Nayar :969),
    with parameter spectra interpolated to ``wave`` up front.

    Feed to rt.scattering.brdf_fourier_matrix for the doubling method, or
    call directly with one geometry for single scatter.
    """
    wave = jnp.asarray(wave)
    lowbc = int(surf.lowbc)
    if lowbc == 1:  # Lambertian (calc_albedo: GALB<0 -> 1-emissivity)
        emis = jnp.interp(wave, jnp.asarray(surf.vem),
                          jnp.asarray(surf.emissivity))
        albedo = jnp.where(
            surf.galb >= 0.0, surf.galb * jnp.ones_like(wave), 1.0 - emis
        )

        def fn(sol_ang, emiss_ang, azi_ang):
            return lambert_brdf(albedo, len(np.atleast_1d(emiss_ang)))

        return fn
    if lowbc == 2:  # Hapke
        h = surf.hapke
        if h is None:
            raise ValueError("LOWBC=2 (Hapke) needs SurfaceSpec.hapke "
                             "(.hap file or HDF5 Surface Hapke block)")
        hv = jnp.asarray(h.vem)
        p = [jnp.interp(wave, hv, jnp.asarray(getattr(h, name)))
             for name in ("sglalb", "k", "bs0", "hs", "bc0", "hc",
                          "roughness", "g1", "g2", "f")]

        def fn(sol_ang, emiss_ang, azi_ang):
            return hapke_brdf(*p, jnp.asarray(sol_ang),
                              jnp.asarray(emiss_ang), jnp.asarray(azi_ang))

        return fn
    if lowbc == 3:  # Oren–Nayar
        if surf.on_albedo is None:
            raise ValueError("LOWBC=3 (Oren–Nayar) needs SurfaceSpec."
                             "on_albedo/on_roughness")
        alb = jnp.interp(wave, jnp.asarray(surf.vem),
                         jnp.asarray(surf.on_albedo))
        rough = jnp.interp(wave, jnp.asarray(surf.vem),
                           jnp.asarray(surf.on_roughness))

        def fn(sol_ang, emiss_ang, azi_ang):
            return oren_nayar_brdf(alb, rough, jnp.asarray(sol_ang),
                                   jnp.asarray(emiss_ang),
                                   jnp.asarray(azi_ang))

        return fn
    raise ValueError(f"no BRDF for LOWBC={lowbc}")
