"""Line-of-sight path construction (nadir / limb).

TPU-first re-expression of the reference AtmCalc/Path machinery
(``AtmCalc_0.py:33-420``, ``Path_0.py:32``): the per-path layer lists become
static index permutations (layinc), and the geometric scale factors are a
vectorized expression over layer base radii — differentiable wrt baseh for
jacfwd.

Paths hold STATIC shape: (nlayin, npath) with nlayin = max over paths and a
validity mask for shorter paths (ragged geometry -> pad + mask).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from archnemesis_tpu.core.types import Layers
from archnemesis_tpu.enums import PathCalc
from archnemesis_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Paths:
    """Per-path layer inclusion and scale factors.

    Mirrors the reference Path_0 outputs (Path_0.py:161-173): LAYINC, SCALE,
    EMTEMP, NLAYIN — with static shapes and an explicit mask.
    """

    layinc: Any  # (NLAYIN, NPATH) int32 layer indices
    scale: Any  # (NLAYIN, NPATH) LOS/vertical scale factor
    emtemp: Any  # (NLAYIN, NPATH) emission temperature
    mask: Any  # (NLAYIN, NPATH) 1.0 where layer participates
    sol_ang: Any  # (NPATH,)
    emiss_ang: Any  # (NPATH,)
    azi_ang: Any  # (NPATH,)

    imod: PathCalc = static_field(default=PathCalc.THERMAL_EMISSION)
    surface_visible: bool = static_field(default=True)  # False for limb paths

    @property
    def npath(self) -> int:
        return self.layinc.shape[1]

    @property
    def nlayin(self) -> int:
        return self.layinc.shape[0]


def _scale_factors(layers: Layers, radius, h_top, angle_deg, z0):
    """LOS/vertical scale factor per layer for a ray with zenith angle
    ``angle_deg`` at radius ``z0`` (reference AtmCalc_0.py:380-400)."""
    sin2a = jnp.sin(jnp.deg2rad(angle_deg)) ** 2
    cosa = jnp.cos(jnp.deg2rad(angle_deg))
    rb = radius + layers.baseh  # (NLAY,)
    h_top = jnp.atleast_1d(jnp.asarray(h_top, dtype=layers.baseh.dtype))
    r_up = jnp.concatenate([rb[1:], radius + h_top])
    h_up = jnp.concatenate([layers.baseh[1:], h_top])
    s0 = jnp.sqrt(jnp.clip(rb**2 - sin2a * z0**2, 0.0, None)) - z0 * cosa
    s1 = jnp.sqrt(jnp.clip(r_up**2 - sin2a * z0**2, 0.0, None)) - z0 * cosa
    return (s1 - s0) / (h_up - layers.baseh)


def nadir_path(
    layers: Layers,
    radius,
    h_top,
    emiss_ang,
    sol_ang=0.0,
    azi_ang=0.0,
    botlay: int = 0,
    imod: PathCalc = PathCalc.THERMAL_EMISSION,
) -> Paths:
    """Single downward-looking nadir path: layers ordered top->bottom
    (observer in space), zenith angle defined at the bottom layer base
    (IPZEN=BOTTOM).

    Mirrors AtmCalc_0 nadir branch (AtmCalc_0.py:358-375) + SF (:380-400).
    """
    nlay = layers.nlay
    nuse = nlay - botlay
    uselay = np.arange(nlay - 1, botlay - 1, -1, dtype=np.int32)  # top->bottom

    z0 = radius + layers.baseh[botlay]
    sf_all = _scale_factors(layers, radius, h_top, emiss_ang, z0)  # (NLAY,)

    layinc = jnp.asarray(uselay)[:, None]
    scale = sf_all[layinc[:, 0]][:, None]
    emtemp = layers.temp[layinc[:, 0]][:, None]
    mask = jnp.ones((nuse, 1), dtype=layers.temp.dtype)
    return Paths(
        layinc=layinc,
        scale=scale,
        emtemp=emtemp,
        mask=mask,
        sol_ang=jnp.atleast_1d(jnp.asarray(sol_ang, dtype=layers.temp.dtype)),
        emiss_ang=jnp.atleast_1d(jnp.asarray(emiss_ang, dtype=layers.temp.dtype)),
        azi_ang=jnp.atleast_1d(jnp.asarray(azi_ang, dtype=layers.temp.dtype)),
        imod=imod,
        surface_visible=True,
    )


def limb_paths(
    layers: Layers,
    radius,
    h_top,
    botlays,
    imod: PathCalc = PathCalc.THERMAL_EMISSION,
) -> Paths:
    """Limb paths, one per tangent (bottom) layer in ``botlays``.

    Each path traverses the atmosphere down to its tangent layer and back
    out: layinc = [top..botlay, botlay..top-ish] mirrored (AtmCalc_0.py
    :344-356). Scale factors use angle=90 deg at z0 = tangent layer base.
    Pad to the longest path with mask.
    """
    nlay = layers.nlay
    botlays = [int(b) for b in botlays]
    npath = len(botlays)
    nlayin = max(2 * (nlay - b) for b in botlays)

    layinc_np = np.zeros((nlayin, npath), dtype=np.int32)
    mask_np = np.zeros((nlayin, npath))
    for ip, b in enumerate(botlays):
        nuse = 2 * (nlay - b)
        half = nuse // 2
        # first half: top down to tangent layer; second half: back out
        layinc_np[:half, ip] = np.arange(nlay - 1, b - 1, -1)
        layinc_np[half:nuse, ip] = np.arange(b, nlay)
        mask_np[:nuse, ip] = 1.0

    layinc = jnp.asarray(layinc_np)
    mask = jnp.asarray(mask_np, dtype=layers.temp.dtype)

    # per-path scale factors at tangent radius
    scales = []
    for ip, b in enumerate(botlays):
        z0 = radius + layers.baseh[b]
        sf_all = _scale_factors(layers, radius, h_top, 90.0, z0)
        scales.append(sf_all[layinc[:, ip]])
    scale = jnp.stack(scales, axis=1) * mask

    # keep real layer temperatures in the padding (contributions are masked
    # in the emission einsum) — zeroing them makes planck's JVP NaN at T=0
    emtemp = layers.temp[layinc]
    zero = jnp.zeros(npath, dtype=layers.temp.dtype)
    return Paths(
        layinc=layinc,
        scale=scale,
        emtemp=emtemp,
        mask=mask,
        sol_ang=zero,
        emiss_ang=zero,
        azi_ang=zero,
        imod=imod,
        surface_visible=False,
    )
