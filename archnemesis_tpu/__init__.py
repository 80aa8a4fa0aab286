"""archnemesis_tpu — a TPU-native planetary radiative-transfer and retrieval
framework.

Re-implements the capabilities of the archNEMESIS planetary RT + retrieval
code (synthesis of planetary spectra in nadir / limb / solar-occultation /
disc-averaged geometries with correlated-k or line-by-line opacities, and
inversion by optimal estimation or nested sampling) as an idiomatic JAX/XLA/
Pallas framework:

- components are frozen pytrees, not mutable classes;
- the forward model is a pure jittable function of (state vector, config);
- Jacobians come from ``jax.jacfwd``, not finite-difference fan-out;
- batch axes (wave, g, layer, path, geometry) are vmapped/sharded over a
  ``jax.sharding.Mesh`` (wave = the "sequence" axis, geometry = data axis);
- hot kernels (Voigt line accumulation, correlated-k overlap, doubling-adding)
  are Pallas TPU kernels or XLA-fused jnp.
"""

__version__ = "0.1.0"

from archnemesis_tpu import constants  # noqa: F401
from archnemesis_tpu import data  # noqa: F401
