"""Device-mesh sharding for the forward model and retrieval.

The domain's parallel axes (SURVEY §2.B):
- ``wave`` — the wavenumber grid (10^4–10^6 points for LBL): the "sequence"
  axis. k-tables, per-layer optical depths, and spectra are sharded along it;
  all per-wave compute (interpolation, overlap mixing, RT integral) is
  embarrassingly parallel, so GSPMD partitions it with zero collectives until
  the final per-geometry spectrum gather.
- ``data`` — geometries / FOV points / retrievals: pure data parallelism.

Strategy: annotate the big inputs (k-tables along NWAVE) with NamedSharding
and let XLA propagate; reductions across wave happen only in the convolution
(all-gather of the spectrum, negligible bytes) and in the OE linalg
(replicated). This mirrors jax's recommended "shard the inputs, let the
compiler insert collectives" recipe rather than hand-written NCCL-style
messaging.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_wave: int | None = None, n_data: int = 1, devices=None) -> Mesh:
    """Build a (data, wave) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_wave is None:
        n_wave = n // n_data
    dev = np.asarray(devices)[: n_data * n_wave].reshape(n_data, n_wave)
    return Mesh(dev, axis_names=("data", "wave"))


def shard_spec(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def shard_ktables_by_wave(ktab, mesh: Mesh):
    """Place k-tables with the NWAVE axis sharded over the mesh's wave axis.

    k is (NGAS, NWAVE, NG, NP, NT) -> P(None, 'wave'); small per-wave grids
    are sharded 1-D; scalars/grids replicated.
    """
    k_sh = jax.device_put(ktab.k, shard_spec(mesh, None, "wave"))
    wave_sh = jax.device_put(ktab.wave, shard_spec(mesh, "wave"))
    extra = {}
    if getattr(ktab, "logk", None) is not None:
        extra["logk"] = jax.device_put(
            ktab.logk, shard_spec(mesh, None, "wave")
        )
    return ktab.replace(k=k_sh, wave=wave_sh, **extra)
