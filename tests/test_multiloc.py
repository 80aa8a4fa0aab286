"""Multi-location forward (NLOCATIONS > 1) end-to-end.

The vmapped multi-location nadir forward must equal per-location
single-Atmosphere forwards exactly, and the FOV weighting must match the
manual weighted sum.  Uses the synthetic flagship problem from
__graft_entry__ (3 perturbed locations, different viewing angles).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _problem():
    import __graft_entry__ as ge

    return ge._tiny_problem(nwave=48, ng=8, nlay=9, npro=12,
                            dtype=np.float64)


def test_multiloc_matches_per_location():
    from archnemesis_tpu.core.types import stack_atmospheres
    from archnemesis_tpu.forward import forward_nadir
    from archnemesis_tpu.multiloc import (
        forward_nadir_multiloc,
        fov_weighted_spectrum,
        select_location,
    )

    atm, laycfg, ktab, surf, cfg = _problem()
    atms = [
        atm,
        atm.replace(t=np.asarray(atm.t) * 1.05,
                    latitude=np.asarray(10.0, float)),
        atm.replace(t=np.asarray(atm.t) * 0.95,
                    vmr=np.asarray(atm.vmr) * 1.1,
                    latitude=np.asarray(-20.0, float)),
    ]
    multi = stack_atmospheres(atms)
    emiss = np.array([0.0, 30.0, 55.0])

    spec = np.asarray(jax.jit(
        lambda m: forward_nadir_multiloc(
            m, laycfg, ktab, None, None, surf, cfg, emiss_ang=emiss
        )
    )(multi))
    assert spec.shape == (48, 3)

    for i in range(3):
        # via select_location on the stacked pytree
        atm_i = select_location(multi, i)
        want = np.asarray(forward_nadir(
            atm_i, laycfg, ktab, None, None, surf, cfg,
            emiss_ang=float(emiss[i]),
        ))
        np.testing.assert_allclose(spec[:, i], want[:, 0], rtol=2e-12)
        # and the sliced pytree equals the original single Atmosphere
        np.testing.assert_allclose(
            np.asarray(atm_i.t), np.asarray(atms[i].t), rtol=0
        )

    w = np.array([0.5, 0.3, 0.2])
    fov = np.asarray(fov_weighted_spectrum(jnp.asarray(spec), w))
    np.testing.assert_allclose(fov, spec @ (w / w.sum()), rtol=1e-14)


def test_multiloc_jacfwd():
    """AD flows through the batched location axis (the reference's
    multi-location Jacobian was never wired at all)."""
    from archnemesis_tpu.core.types import stack_atmospheres
    from archnemesis_tpu.multiloc import forward_nadir_multiloc

    atm, laycfg, ktab, surf, cfg = _problem()
    multi = stack_atmospheres([atm, atm.replace(t=np.asarray(atm.t) + 5.0)])

    def f(scale):
        m = multi.replace(t=multi.t * scale)
        return forward_nadir_multiloc(
            m, laycfg, ktab, None, None, surf, cfg,
            emiss_ang=np.array([0.0, 20.0]),
        ).sum()

    g = jax.jacfwd(f)(jnp.asarray(1.0))
    assert np.isfinite(float(g)) and float(g) != 0.0
