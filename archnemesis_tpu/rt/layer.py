"""Atmosphere layering: split profiles into layers and average properties.

TPU-first re-expression of the reference layering (``Layer_0.py``:
layer_split:1402, layer_average:755): the per-layer Python loop with
scipy.simpson becomes a vmapped fixed-size quadrature — every layer
integrates NINT samples with static composite-Simpson weights, so the whole
layering is one fused elementwise+gather program under jit, differentiable
through jacfwd for analytic Jacobians.

All angles in degrees; LAYANG=0 for nadir splitting, 90 for limb.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.constants import AVOGAD

# The reference layer_average uses a locally rounded Boltzmann constant
# (Layer_0.py:829 ``k_B = 1.38065e-23``); mirror it for exact golden parity.
K_B = 1.38065e-23
from archnemesis_tpu.core.types import Atmosphere, LayerConfig, Layers
from archnemesis_tpu.enums import LayerIntegrationScheme, LayerType
from archnemesis_tpu.utils.interp import interp1d_extrap, simpson_weights


def split_layers(atm: Atmosphere, cfg: LayerConfig, layang=0.0,
                 layht_override=None):
    """Layer base altitudes/pressures for the configured scheme.

    Mirrors reference ``layer_split`` (Layer_0.py:1402). Returns
    (baseh (NLAY,), basep (NLAY,)). ``cfg.laytyp`` selects a Python-level
    branch (static); profile arrays are traced. ``layht_override`` (traced,
    metres) replaces cfg.layht — limb/SO geometries re-base the layering at
    the tangent height (reference calc_path ForwardModel_0.py:2996-2998),
    and keeping it traced lets the tangent-height batch be one vmapped
    program instead of NAV recompilations.
    """
    h, p = atm.h, atm.p
    nlay = cfg.nlay
    # reference resets LAYHT to H(0) when below the profile base
    # (layer_split Layer_0.py:1450) — traced clamp keeps it jit-safe while
    # H changes across retrieval iterations
    base = cfg.layht if layht_override is None else layht_override
    layht = jnp.maximum(jnp.asarray(base, dtype=h.dtype), h[0])

    if cfg.laytyp == LayerType.EQUAL_PRESSURE:
        pbot = interp1d_extrap(h, p, layht)
        basep = jnp.linspace(pbot, p[-1], nlay + 1)[:-1]
        baseh = interp1d_extrap(p[::-1], h[::-1], basep)
    elif cfg.laytyp == LayerType.EQUAL_LOG_PRESSURE:
        pbot = interp1d_extrap(h, p, layht)
        basep = jnp.exp(
            jnp.linspace(jnp.log(pbot), jnp.log(p[-1]), nlay + 1)[:-1]
        )
        baseh = interp1d_extrap(p[::-1], h[::-1], basep)
    elif cfg.laytyp == LayerType.EQUAL_HEIGHT:
        baseh = jnp.linspace(layht, h[-1], nlay + 1)[:-1]
        basep = interp1d_extrap(h, p, baseh)
    elif cfg.laytyp == LayerType.EQUAL_PATH_LENGTH:
        sin = jnp.sin(jnp.deg2rad(layang))
        cos = jnp.cos(jnp.deg2rad(layang))
        z0 = atm.radius + layht
        zmax = atm.radius + h[-1]
        smax = jnp.sqrt(zmax**2 - (z0 * sin) ** 2) - z0 * cos
        bases = jnp.linspace(0.0, smax, nlay + 1)[:-1]
        baseh = jnp.sqrt(bases**2 + z0**2 + 2 * bases * z0 * cos) - atm.radius
        basep = jnp.exp(interp1d_extrap(h, jnp.log(p), baseh))
    elif cfg.laytyp == LayerType.BASE_PRESSURE:
        basep = jnp.asarray(cfg.p_base)
        baseh = interp1d_extrap(p[::-1], h[::-1], basep)
    elif cfg.laytyp == LayerType.BASE_HEIGHT:
        baseh = jnp.asarray(cfg.h_base)
        basep = jnp.exp(interp1d_extrap(h, jnp.log(p), baseh))
    else:
        raise ValueError(f"unknown layer type {cfg.laytyp}")
    return baseh, basep


def average_layers(atm: Atmosphere, cfg: LayerConfig, baseh, basep, layang=0.0):
    """Curtis–Godson absorber-weighted (or mid-path) layer averages.

    Mirrors reference ``layer_average`` (Layer_0.py:755). Equal-log-pressure
    NEMESIS convention: the log-pressure grid runs from LAYHT's pressure to
    the top profile level; the topmost layer extends to the top of the
    profile.

    The NLAY × NINT quadrature is materialized as (NLAY, NINT) sample arrays
    — pure gathers + one weighted reduction, ideal for the VPU.
    """
    h, p, t = atm.h, atm.p, atm.t
    vmr, dust, parah2 = atm.vmr, atm.dust, atm.parah2
    radius = atm.radius
    nlay = cfg.nlay
    nint = cfg.nint

    delh = jnp.concatenate([baseh[1:] - baseh[:-1], (h[-1] - baseh[-1])[None]])

    sin = jnp.sin(jnp.deg2rad(layang))
    cos = jnp.cos(jnp.deg2rad(layang))
    # slant geometry is anchored at the base of the lowest layer; baseh[0]
    # equals the effective LAYHT by construction (including tangent-height
    # overrides for limb paths), unlike the static cfg value
    z0 = radius + baseh[0]
    zmax = radius + h[-1]
    smax = jnp.sqrt(zmax**2 - (z0 * sin) ** 2) - z0 * cos
    bases = jnp.sqrt((radius + baseh) ** 2 - (z0 * sin) ** 2) - z0 * cos
    dels = jnp.concatenate([bases[1:] - bases[:-1], (smax - bases[-1])[None]])
    laysf = dels / delh
    baset = interp1d_extrap(h, t, baseh)

    # molecular-weight profile only feeds dust in particles-per-gram units
    xmolwt = atm.molwt * 1000.0  # kg/mol -> g/mol as in reference :879

    if cfg.layint == LayerIntegrationScheme.ABSORBER_WEIGHTED_AVERAGE:
        # (NLAY, NINT) path-length samples in each layer
        s_upper = jnp.concatenate([bases[1:], smax[None]])
        frac_lin = jnp.asarray(np.linspace(0.0, 1.0, nint))
        s = bases[:, None] + (s_upper - bases)[:, None] * frac_lin[None, :]
        hgt = jnp.sqrt(s**2 + z0**2 + 2 * s * z0 * cos) - radius

        p_s = interp1d_extrap(h, p, hgt)
        t_s = interp1d_extrap(h, t, hgt)
        fr_s = interp1d_extrap(h, parah2, hgt)
        mw_s = interp1d_extrap(h, xmolwt, hgt)
        # (p/t) * (1/K_B): dividing by the tiny product K_B*t first would
        # make the quotient-rule denominator (K_B*t)^2 ~ 1e-42 underflow f32
        # under jacfwd; this ordering keeps every intermediate in range
        duds = (p_s / t_s) * (1.0 / K_B)  # molecules m^-3

        w = jnp.asarray(simpson_weights(nint)).astype(duds.dtype)
        ds = (s_upper - bases) / (nint - 1)  # per-layer sample spacing

        # Weighted means divide by TOTAM ~ 1e29: the tangent's quotient rule
        # squares that (1e58, overflowing f32 under jacfwd). Work with a
        # 2^-97-scaled number density (exact power-of-2: f64 results are
        # bit-identical) so the divisor is O(1).
        DUDS_SCALE = 2.0**97
        duds_s = duds * (2.0**-97)

        def integ_s(y):
            # scaled path integral per layer: (NLAY, NINT) -> (NLAY,)
            return jnp.sum(y * w[None, :], axis=1) * ds

        totam_s = integ_s(duds_s)
        totam = totam_s * DUDS_SCALE
        height = integ_s(hgt * duds_s) / totam_s
        press = integ_s(p_s * duds_s) / totam_s
        temp = integ_s(t_s * duds_s) / totam_s
        frac = integ_s(fr_s * duds_s) / totam_s

        vmr_s = interp1d_extrap(h, vmr, hgt.reshape(-1)).reshape(
            nlay, nint, -1
        )
        amount = (
            jnp.einsum("lik,i->lk", vmr_s * duds_s[:, :, None], w)
            * ds[:, None]
            * DUDS_SCALE
        )
        pp = (
            jnp.einsum("lik,i->lk", vmr_s * (p_s * duds_s)[:, :, None], w)
            * ds[:, None]
            / totam_s[:, None]
        )

        if atm.ndust > 0:
            dust_s = interp1d_extrap(h, dust, hgt.reshape(-1)).reshape(
                nlay, nint, -1
            )
            if atm.dust_units_flag is not None:
                cont_cols = []
                for j in range(atm.ndust):
                    if atm.dust_units_flag[j] == -1:
                        # particles per gram of atmosphere (reference :997)
                        cont_j = (
                            jnp.einsum(
                                "li,i->l",
                                dust_s[:, :, j] * duds * mw_s / AVOGAD,
                                w,
                            )
                            * ds
                        )
                    else:
                        cont_j = jnp.einsum("li,i->l", dust_s[:, :, j], w) * ds
                    cont_cols.append(cont_j)
                cont = jnp.stack(cont_cols, axis=1)
            else:
                cont = jnp.einsum("lik,i->lk", dust_s, w) * ds[:, None]
        else:
            cont = jnp.zeros((nlay, 0), dtype=totam.dtype)

    elif cfg.layint == LayerIntegrationScheme.MID_PATH:
        s_upper = jnp.concatenate([bases[1:], smax[None]])
        s_mid = 0.5 * (bases + s_upper)
        height = jnp.sqrt(s_mid**2 + z0**2 + 2 * s_mid * z0 * cos) - radius
        press = interp1d_extrap(h, p, height)
        temp = interp1d_extrap(h, t, height)
        frac = interp1d_extrap(h, parah2, height)
        mw_l = interp1d_extrap(h, xmolwt, height)
        duds = (press / temp) * (1.0 / K_B)  # f32-safe (see above)
        totam = duds * dels
        vmr_l = interp1d_extrap(h, vmr, height)
        pp = vmr_l * press[:, None]
        amount = vmr_l * totam[:, None]
        if atm.ndust > 0:
            dust_l = interp1d_extrap(h, dust, height)
            if atm.dust_units_flag is not None:
                cont_cols = []
                for j in range(atm.ndust):
                    if atm.dust_units_flag[j] == -1:
                        cont_j = dust_l[:, j] * totam * mw_l / AVOGAD
                    else:
                        cont_j = dust_l[:, j] * dels
                    cont_cols.append(cont_j)
                cont = jnp.stack(cont_cols, axis=1)
            else:
                cont = dust_l * dels[:, None]
        else:
            cont = jnp.zeros((nlay, 0), dtype=totam.dtype)
    else:
        raise ValueError(f"unknown layer integration scheme {cfg.layint}")

    # scale slant columns back to vertical (reference :1012-1025)
    totam = totam / laysf
    amount = amount / laysf[:, None]
    cont = cont / laysf[:, None] if atm.ndust > 0 else cont

    return Layers(
        baseh=baseh,
        basep=basep,
        baset=baset,
        delh=delh,
        height=height,
        press=press,
        temp=temp,
        totam=totam,
        amount=amount,
        pp=pp,
        cont=cont,
        frac=frac,
        laysf=laysf,
    )


def build_layers(atm: Atmosphere, cfg: LayerConfig, layang=0.0,
                 layht_override=None) -> Layers:
    """split + average in one call (reference ``calc_layering`` Layer_0.py:386)."""
    baseh, basep = split_layers(atm, cfg, layang, layht_override)
    return average_layers(atm, cfg, baseh, basep, layang)
