"""Atmosphere physics: molecular weight, gravity, hydrostatic balancing, VMR
renormalisation.

TPU-first re-expression of the reference ``Atmosphere_0`` methods
(``Atmosphere_0.py``: calc_molwt :768, calc_grav :858, adjust_hydrostatH
:1027, adjust_hydrostatP :930, adjust_VMR :703): the per-level loops become
cumulative sums anchored at a static reference level, and the hydrostatic
convergence loop is a ``lax.while_loop`` (forward-mode differentiable, so
jacfwd flows through the re-balance exactly as the reference's analytic
gradients intend).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from archnemesis_tpu import data as refdata
from archnemesis_tpu.constants import G_GRAV, R_GAS
from archnemesis_tpu.core.types import Atmosphere


def gas_molwt_per_column(gas_id, iso_id) -> np.ndarray:
    """Static per-gas molar masses (g/mol): terrestrial-abundance mean for
    iso 0, isotope mass otherwise (reference calc_molwt Atmosphere_0.py:768)."""
    out = np.zeros(len(gas_id))
    for i, (g, s) in enumerate(zip(gas_id, iso_id)):
        out[i] = refdata.molecular_weight(int(g), int(s))
    return out


def calc_molwt(vmr, gas_masses):
    """Mean molecular weight profile (kg/mol). vmr: (NP, NVMR)."""
    gm = jnp.asarray(gas_masses)
    vmrtot = jnp.sum(vmr, axis=1)
    molwt = jnp.sum(vmr * gm[None, :], axis=1) / vmrtot
    return molwt / 1000.0


# Legendre polynomials P1..P6 (closed form; reference uses scipy legendre)
def _legendre_all(x):
    p1 = x
    p2 = 0.5 * (3 * x**2 - 1)
    p3 = 0.5 * (5 * x**3 - 3 * x)
    p4 = 0.125 * (35 * x**4 - 30 * x**2 + 3)
    p5 = 0.125 * (63 * x**5 - 70 * x**3 + 15 * x)
    p6 = 0.0625 * (231 * x**6 - 315 * x**4 + 105 * x**2 - 5)
    return [p1, p2, p3, p4, p5, p6]


def calc_grav(h, latitude, planet: int, radius_override=None):
    """Gravity profile (m/s^2) and planetocentric radius (m) following
    Lindal et al. 1986 (reference calc_grav Atmosphere_0.py:858).

    h in metres; latitude in degrees (planetographic). planet is the static
    NEMESIS planet id used to look up mass/rotation/flattening/J coeffs.
    radius_override (m, traced) replaces the catalogue equatorial radius —
    used by the retrieved-radius models 555/556.
    """
    info = refdata.planet_info()[str(int(planet))]
    mass, rotation = info["mass"], info["rotation"]
    flatten, jcoeff = info["flatten"], info["Jcoeff"]
    radius_km = info["radius"]
    if radius_override is not None:
        radius_km = radius_override / 1.0e3

    xgm = mass * G_GRAV * 1.0e6
    xomega = 2.0 * np.pi / (rotation * 24.0 * 3600.0)
    xellip = 1.0 / (1.0 - flatten)
    xcoeff = np.array([jcoeff[0] / 1e3, jcoeff[1] / 1e6, jcoeff[2] / 1e8])
    xradius = radius_km * 1.0e5  # cm

    lat = jnp.deg2rad(latitude)
    latc = jnp.arctan(jnp.tan(lat) / xellip**2)
    slatc, clatc = jnp.sin(latc), jnp.cos(latc)
    rr = jnp.sqrt(clatc**2 + xellip**2 * slatc**2)
    r = (xradius + h * 1.0e2) / rr  # cm
    radius_m = (xradius / rr) * 1.0e-5 * 1.0e3

    pol = _legendre_all(slatc)

    g = 1.0
    for i in range(3):
        ix = i + 1
        g = g - (2 * ix + 1) * rr ** (2 * ix) * xcoeff[ix - 1] * pol[2 * ix - 1]
    gradial = g * xgm / r**2 - r * xomega**2 * clatc**2

    gtheta1 = 0.0
    for i in range(3):
        ix = i + 1
        gtheta1 = gtheta1 - (
            4.0 * ix**2 * rr ** (2 * ix) * xcoeff[ix - 1]
            * (pol[2 * ix - 2] - slatc * pol[2 * ix - 1]) / clatc
        )
    gtheta = gtheta1 * xgm / r**2 + r * xomega**2 * clatc * slatc

    gtot = jnp.sqrt(gradial**2 + gtheta**2) * 0.01  # m/s^2
    return gtot, radius_m


def _hydrostat_h_once(h, p, t, molwt, latitude, planet, ialt,
                      radius_override=None):
    grav, _ = calc_grav(h, latitude, planet, radius_override)
    scale = R_GAS * t / (molwt * grav)  # m
    n = h.shape[0]
    # sh between consecutive levels
    sh = 0.5 * (scale[:-1] + scale[1:])
    dlogp = jnp.log(p[1:] / p[:-1])
    step = -sh * dlogp  # h[i+1] - h[i]
    # anchor at level ialt with value h[ialt] (0 if interior, reference
    # :1062-1063 forces the anchor to 0 when 0<ialt<NP-1)
    anchor = jnp.where((ialt > 0) & (ialt < n - 1), 0.0, h[ialt])
    cum = jnp.concatenate([jnp.zeros(1, h.dtype), jnp.cumsum(step)])
    return anchor + cum - cum[ialt]


def adjust_hydrostat_h(atm: Atmosphere, ialt: int | None = None) -> Atmosphere:
    """Iteratively rebalance heights hydrostatically (reference
    adjust_hydrostatH Atmosphere_0.py:1027): repeat until the total
    atmospheric depth changes by < 1 %."""
    if ialt is None:
        # trace-safe: dynamic index flows into gathers/where only
        ialt = jnp.argmin(jnp.abs(atm.h))

    def cond(carry):
        h, xdepth = carry
        return xdepth > 1.0

    def body(carry):
        h, _ = carry
        atdepth = h[-1] - h[0]
        h_new = _hydrostat_h_once(
            h, atm.p, atm.t, atm.molwt, atm.latitude, atm.planet, ialt,
            getattr(atm, "planet_radius", None)
        )
        atdepth1 = h_new[-1] - h_new[0]
        xdepth = 100.0 * jnp.abs((atdepth1 - atdepth) / atdepth)
        return (h_new, xdepth)

    h_fin, _ = jax.lax.while_loop(cond, body, (atm.h, jnp.asarray(100.0, atm.h.dtype)))
    grav, radius = calc_grav(h_fin, atm.latitude, atm.planet,
                             getattr(atm, "planet_radius", None))
    return atm.replace(h=h_fin, radius=radius)


def adjust_hydrostat_p(atm: Atmosphere, htan, ptan, ialt: int | None = None) -> Atmosphere:
    """Rescale pressures hydrostatically so p(htan) = ptan (reference
    adjust_hydrostatP Atmosphere_0.py:930)."""
    if ialt is None:
        i = jnp.argmin(jnp.abs(atm.h - htan))
        ialt = i - ((atm.h[i] > htan) & (i > 0))

    grav, _ = calc_grav(atm.h, atm.latitude, atm.planet,
                        getattr(atm, "planet_radius", None))
    scale = R_GAS * atm.t / (atm.molwt * grav)

    sh_tan = 0.5 * (scale[ialt] + scale[ialt + 1])
    p_ialt = ptan * jnp.exp(-(atm.h[ialt] - htan) / sh_tan)

    sh = 0.5 * (scale[:-1] + scale[1:])
    dh = atm.h[1:] - atm.h[:-1]
    step = -dh / sh  # log p[i+1] - log p[i]
    cum = jnp.concatenate([jnp.zeros(1, atm.h.dtype), jnp.cumsum(step)])
    logp = jnp.log(p_ialt) + cum - cum[ialt]
    # level ialt+1 uses sh_tan from htan, not the generic step (reference
    # :966-969); rebuild it and propagate upward
    p_ialt1 = ptan * jnp.exp(-(atm.h[ialt + 1] - htan) / sh_tan)
    corr = jnp.log(p_ialt1) - logp[ialt + 1]
    upper = jnp.arange(atm.h.shape[0]) >= ialt + 1
    logp = jnp.where(upper, logp + corr, logp)
    return atm.replace(p=jnp.exp(logp))


def adjust_vmr(vmr, iscale):
    """Renormalise VMRs to sum to 1, scaling only gases with iscale=1
    (reference adjust_VMR Atmosphere_0.py:703; SVP capping not included —
    applied separately when a .vpf is present)."""
    iscale = np.asarray(iscale)
    scalable = jnp.asarray(iscale == 1, dtype=vmr.dtype)[None, :]
    sumtot = jnp.sum(vmr, axis=1, keepdims=True)
    sum_fixed = jnp.sum(vmr * (1 - scalable), axis=1, keepdims=True)
    xfac = (1.0 - sum_fixed) / (sumtot - sum_fixed)
    return jnp.where(scalable > 0, vmr * xfac, vmr)


def apply_svp_cap(atm: Atmosphere) -> Atmosphere:
    """Cap gas VMRs at their saturation vapour pressure where a .vpf entry
    exists (reference adjust_VMR Atmosphere_0.py:753-765:
    svp = vp exp(a + b/T + c T + d T^2) [atm])."""
    if not atm.svp:
        return atm
    coeffs = refdata.svp_coefficients()
    vmr = jnp.asarray(atm.vmr)
    p_atm = atm.p / 101325.0
    for gas_id, iso_id, vp, _flag in atm.svp:
        col = None
        for i, (g, s) in enumerate(zip(atm.gas_id, atm.iso_id)):
            if g == gas_id and s == iso_id:
                col = i
                break
        if col is None:
            continue
        a, b, c, d = coeffs[str(int(gas_id))]
        svp = vp * jnp.exp(a + b / atm.t + c * atm.t + d * atm.t**2)
        pp = vmr[:, col] * p_atm
        vmr = vmr.at[:, col].set(
            jnp.where(pp > svp, svp / p_atm, vmr[:, col])
        )
    return atm.replace(vmr=vmr)
