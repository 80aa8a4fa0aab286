"""Multi-location (NLOCATIONS > 1) forward evaluation.

The reference can HOLD multi-location Atmospheres/Surfaces
(``Atmosphere_0`` 2-D (NP, NLOCATIONS) arrays, model 1002 per-location
scaling, ``ForwardModel_0.select_location:2868``) but its forward drivers
raise on NLOCATIONS > 1 (``nemesisfm``, ForwardModel_0.py:463-466); the
standalone per-location helper ``calc_spectrum_location`` (:5428) has no
caller.  The TPU-native design completes the path: a multi-location
Atmosphere is a pytree with a leading (NLOCATIONS,) axis on its profile
leaves (``core.types.stack_atmospheres``), a location is selected by
slicing that axis, and the multi-location forward is ONE ``jax.vmap``
over it — all locations evaluate batched on the MXU/VPU instead of the
reference's (dead) joblib fan-out, and the FOV weighting is a single
contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def select_location(atm_multi, iloc: int):
    """Slice one location out of a stacked multi-location Atmosphere
    (reference select_location, ForwardModel_0.py:2868): every profile
    leaf carries a leading (NLOCATIONS,) axis; static metadata is shared.
    """
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.asarray(x)[iloc], atm_multi
    )


def forward_nadir_multiloc(
    atm_multi,
    laycfg,
    ktab,
    cia,
    aero,
    surf,
    cfg,
    emiss_ang,          # (NLOCATIONS,) per-location emission angles
    sol_ang=None,       # (NLOCATIONS,) or None -> 180 (thermal only)
    azi_ang=None,       # (NLOCATIONS,) or None -> 0
):
    """Per-location nadir forward spectra, batched over the location axis.

    Returns (NWAVE, NLOCATIONS).  Equivalent to looping the reference's
    ``calc_spectrum_location`` over iLOCATION, but as one vmapped device
    program (tables and config are shared; only the atmosphere column and
    the viewing geometry vary per location).
    """
    from archnemesis_tpu.forward import forward_nadir

    n_loc = jax.tree_util.tree_leaves(atm_multi)[0].shape[0]
    emiss_ang = jnp.broadcast_to(jnp.asarray(emiss_ang, float), (n_loc,))
    sol_ang = (jnp.full((n_loc,), 180.0) if sol_ang is None
               else jnp.broadcast_to(jnp.asarray(sol_ang, float), (n_loc,)))
    azi_ang = (jnp.zeros((n_loc,)) if azi_ang is None
               else jnp.broadcast_to(jnp.asarray(azi_ang, float), (n_loc,)))

    def one(atm, e, s, a):
        return forward_nadir(
            atm, laycfg, ktab, cia, aero, surf, cfg,
            emiss_ang=e, sol_ang=s, azi_ang=a,
        )

    spec = jax.vmap(one)(atm_multi, emiss_ang, sol_ang, azi_ang)
    if spec.ndim == 3:  # (NLOC, NWAVE, NPATH=1) -> drop the path axis
        spec = spec[..., 0]
    return jnp.moveaxis(spec, 0, -1)  # (NWAVE, NLOCATIONS)


def fov_weighted_spectrum(spec_loc, wgeom):
    """FOV-average per-location spectra with the measurement weights
    (reference WGEOM application, nemesisfm ForwardModel_0.py:1670-1675):
    one contraction instead of the per-IAV accumulation loop."""
    w = jnp.asarray(wgeom)
    return spec_loc @ (w / jnp.sum(w))
